package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: ≤ k (score, id) entries kept sorted by
  * (score desc, id asc) — the same total order as a ranking window, so the
  * exploded output is bit-identical to `row_number() over (order by score
  * desc, id asc) <= k`. Insertion is an O(k) shift; k is small (10s). */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  def insert(s: Double, id: Long): Unit = {
    var pos = 0
    while (pos < n && (scores(pos) > s || (scores(pos) == s && ids(pos) < id))) pos += 1
    if (pos >= k) return
    var j = math.min(n, k - 1)
    while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(pos) = s; ids(pos) = id
    if (n < k) n += 1
  }
}

/** Top-k as a TypedImperativeAggregate: each group keeps a bounded
  * (score desc, id asc) heap-of-k instead of sorting its whole partition
  * through a ranking window. PARTIAL AGGREGATION works (insert is
  * commutative/associative on the bounded buffer), so top-k combines
  * map-side: a query group never concentrates its full candidate set in one
  * window partition — the property a global `Window.partitionBy(query)`
  * lacks at large candidate counts. */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData((0 until buf.n).map { i =>
      new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Column entry point: the group's top-k (score, id) pairs, ordered by
    * (score desc, id asc), as array&lt;struct&lt;score,id&gt;&gt;. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** Payload-carrying variant: top-k (score, id, payload…) pairs in the
    * same (score desc, id asc) order. Use when the ranked rows carry
    * extra columns the consumer needs: the plain [[topK]] forces a
    * join-back on (group, id) to recover them, which references the
    * candidate subtree a SECOND time — and ReuseExchange does not cover
    * the two differently-keyed consumers, so the whole upstream
    * aggregation runs twice (measured round 10: the join-back rewrite of
    * recsys_user_recs was 4× slower than the window it meant to replace;
    * BASELINE.md §"Round 10: TopKAgg rewrite … REJECTED"). Carrying the
    * payload in the aggregate buffer keeps the candidate subtree
    * single-consumption: k·|payload| longs per group is the entire extra
    * state. Payload expressions must be LongType and NON-NULL for rows
    * whose (score, id) are non-null — a null payload throws rather than
    * silently contributing a plausible-looking 0 (wrap nullable payloads
    * in `coalesce(c, lit(0L))` explicitly if 0 is the intended default). */
  def topKWith(score: Column, id: Column, payload: Seq[Column], k: Int): Column =
    ColumnBridge.column(
      TopKPayloadAgg(ColumnBridge.expression(score),
        ColumnBridge.expression(id),
        payload.map(ColumnBridge.expression), k)
        .toAggregateExpression())
}

/** [[TopKBuffer]] with `p` long payload slots per entry, same
  * (score desc, id asc) bounded-insert order. */
final class TopKPayloadBuffer(val k: Int, val p: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  val payload = new Array[Long](k * p)
  var n = 0

  def insert(s: Double, id: Long, pay: Array[Long]): Unit = {
    var pos = 0
    while (pos < n && (scores(pos) > s || (scores(pos) == s && ids(pos) < id))) pos += 1
    if (pos >= k) return
    var j = math.min(n, k - 1)
    while (j > pos) {
      scores(j) = scores(j - 1); ids(j) = ids(j - 1)
      System.arraycopy(payload, (j - 1) * p, payload, j * p, p)
      j -= 1
    }
    scores(pos) = s; ids(pos) = id
    System.arraycopy(pay, 0, payload, pos * p, p)
    if (n < k) n += 1
  }
}

/** Top-k with long payload columns riding in the buffer — see
  * [[TopKAgg.topKWith]]. Output rows are
  * struct(score double, id long, p0 long, p1 long, …). */
case class TopKPayloadAgg(
    score: Expression,
    id: Expression,
    payload: Seq[Expression],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPayloadBuffer] {

  private def p = payload.length

  override def children: Seq[Expression] = score +: id +: payload
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(
      StructField("score", DoubleType, nullable = false) +:
      StructField("id", LongType, nullable = false) +:
      payload.indices.map(i =>
        StructField(s"p$i", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKPayloadBuffer =
    new TopKPayloadBuffer(k, p)

  override def update(buf: TopKPayloadBuffer, input: InternalRow): TopKPayloadBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val pay = new Array[Long](p)
      var j = 0
      while (j < p) {
        val v = payload(j).eval(input)
        if (v == null)
          // Fail loudly: a silent null→0 coercion would surface as a
          // plausible-looking 0 in results (topKWith scaladoc contract).
          throw new IllegalArgumentException(
            s"topKWith payload #$j is null for id=$i; payloads must be " +
              "non-null — wrap in coalesce(c, lit(0L)) if 0 is intended")
        pay(j) = v.asInstanceOf[Long]
        j += 1
      }
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long], pay)
    }
    buf
  }

  override def merge(a: TopKPayloadBuffer, b: TopKPayloadBuffer): TopKPayloadBuffer = {
    var i = 0
    while (i < b.n) {
      a.insert(b.scores(i), b.ids(i),
        java.util.Arrays.copyOfRange(b.payload, i * p, i * p + p))
      i += 1
    }
    a
  }

  override def eval(buf: TopKPayloadBuffer): Any =
    new GenericArrayData((0 until buf.n).map { i =>
      val fields = new Array[Any](2 + p)
      fields(0) = buf.scores(i); fields(1) = buf.ids(i)
      var j = 0
      while (j < p) { fields(2 + j) = buf.payload(i * p + j); j += 1 }
      new GenericInternalRow(fields)
    }.toArray[Any])

  override def serialize(buf: TopKPayloadBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + (16 + 8 * p) * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i))
      var j = 0
      while (j < p) { bb.putLong(buf.payload(i * p + j)); j += 1 }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPayloadBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKPayloadBuffer(k, p)
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      val pay = new Array[Long](p)
      var j = 0
      while (j < p) { pay(j) = bb.getLong(); j += 1 }
      buf.insert(s, id, pay)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPayloadAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPayloadAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPayloadAgg =
    copy(score = newChildren(0), id = newChildren(1),
      payload = newChildren.drop(2))
}
