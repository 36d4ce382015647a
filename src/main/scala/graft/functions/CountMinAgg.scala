package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Murmur3Hash}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a custom TypedImperativeAggregate: a (depth × width)
  * counter grid where every element increments one counter per row (row d's
  * counter is murmur3(element, seed = d) mod width), and a key's estimate
  * is the MIN of its depth counters.
  *
  * This is the streaming/approximate complement of
  * [[graft.ops.Profile.heavyHitters]]: the exact groupBy shuffles every
  * distinct key; the sketch is a FIXED-SIZE buffer (depth·width longs, e.g.
  * 5×2048 = 80 KB) that partial-aggregates map-side and merges by
  * element-wise addition — heavy-hitter queries over a 100 TB key stream
  * cost one 80 KB-per-partition reduce, no key shuffle at all. Guarantees
  * (Cormode–Muthukrishnan): estimate ≥ true count always (counters only
  * ever overcount via collisions); estimate ≤ true count + εN with
  * probability 1 − δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * The per-slot hash is the same Murmur3_x86_32-over-bytes Spark's `hash()`
  * uses, seeded by the row index, so [[CountMinAgg.cmEstimate]] can
  * reconstruct slot positions as a plain Column expression.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && width >= 1, s"need depth/width >= 1, got $depth x $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_agg needs a string input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, d)
        // int hash → non-negative slot, same as pmod(h, width)
        val slot = ((h % width) + width) % width
        buf(d * width + slot) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {
  /** Column entry point: the group's (depth × width) sketch, row-major. */
  def cmSketch(c: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(CountMinAgg(ColumnBridge.expression(c), depth, width)
      .toAggregateExpression())

  /** Point estimate of `key`'s count from a sketch column: min over rows of
    * the key's slot counter. Pure Column arithmetic — the per-row murmur3
    * matches the aggregate's slot hash exactly (same seed convention). */
  def cmEstimate(sketch: Column, key: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && width >= 1, s"need depth/width >= 1, got $depth x $width")
    val perRow = (0 until depth).map { d =>
      val h = ColumnBridge.column(
        Murmur3Hash(Seq(ColumnBridge.expression(key)), d))
      element_at(sketch, (lit(d * width) + pmod(h, lit(width)) + 1).cast("int"))
    }
    // Runtime geometry guard: a depth/width that differs from the sketch's
    // build parameters would index in-bounds but at WRONG slots, silently
    // breaking the est >= truth guarantee. Fail loudly instead.
    when(size(sketch) === lit(depth * width), least(perRow: _*))
      .otherwise(raise_error(concat(
        lit(s"cmEstimate expects a ${depth}x$width sketch (${depth * width} slots), got "),
        size(sketch).cast("string"), lit(" slots"))).cast("long"))
  }
}
