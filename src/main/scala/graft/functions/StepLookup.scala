package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Map-side sorted-range lookup — the GeoIP/rate-card/promo-calendar
  * enrichment shape: a SMALL sorted dimension (thousands to low millions
  * of interval starts) embedded in the expression tree and probed by
  * binary search per row. The scale alternative to a range JOIN when the
  * interval side fits in memory: a pure NARROW plan — no shuffle, no
  * join state, no bucket replication — that composes with any scan and
  * stays inside whole-stage codegen (the probe is a static call against a
  * referenced array). The arrays ship to executors once with the
  * serialized plan, exactly like a broadcast variable.
  */
object StepLookupImpl {
  /** Id at the rightmost start <= x, or Long.MinValue when x precedes
    * every start (the null sentinel — the expression maps it to null). */
  def lookup(x: Long, starts: Array[Long], ids: Array[Long]): Long = {
    var lo = 0
    var hi = starts.length - 1
    if (hi < 0 || x < starts(0)) return Long.MinValue
    while (lo < hi) { // invariant: starts(lo) <= x; find rightmost
      val mid = (lo + hi + 1) >>> 1
      if (starts(mid) <= x) lo = mid else hi = mid - 1
    }
    ids(lo)
  }
}

/** `step_lookup(x)`: the id of the rightmost interval start <= x from a
  * plan-embedded sorted table; null below the first start. `starts` must
  * be strictly increasing and parallel to `ids`. */
case class StepLookup(child: Expression, starts: Array[Long], ids: Array[Long])
    extends UnaryExpression {

  require(starts.length == ids.length, "starts/ids must be parallel arrays")
  require(starts.length >= 1, "need at least one interval start")
  require(starts.zip(starts.tail).forall { case (a, b) => a < b },
    "starts must be strictly increasing")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = StepLookupImpl.lookup(v.asInstanceOf[Long], starts, ids)
      if (r == Long.MinValue) null else r
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val startsRef = ctx.addReferenceObj("stepStarts", starts, "long[]")
    val idsRef = ctx.addReferenceObj("stepIds", ids, "long[]")
    val childGen = child.genCode(ctx)
    val raw = ctx.freshName("stepRaw")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;
        if (!${childGen.isNull}) {
          long $raw = graft.functions.StepLookupImpl.lookup(
            ${childGen.value}, $startsRef, $idsRef);
          if ($raw != Long.MIN_VALUE) {
            ${ev.isNull} = false;
            ${ev.value} = $raw;
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): StepLookup =
    copy(child = newChild)
}

object StepLookup {
  import org.apache.spark.sql.graft.ColumnBridge

  def stepLookup(x: Column, starts: Array[Long], ids: Array[Long]): Column =
    ColumnBridge.column(StepLookup(ColumnBridge.expression(x), starts, ids))
}
