package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native top-k-pairs aggregate — the hot-path engine behind every grouped
  * top-k in the library (ANN rescoring tails, stratified sampling, KMV
  * bottom-k). Same contract as the original `graft.ops.TopKByScore`
  * `Aggregator`: keep the k best (id, score) pairs per group ordered by
  * (score desc, id asc), with the amortized trim bound (buffer grows to
  * 2·max(k,16) before compacting, so per-row cost is O(1) amortized and any
  * trimmed element is beaten by k better ones — it can never re-enter).
  *
  * Why a `TypedImperativeAggregate` and not the `Aggregator`+`udaf` face it
  * replaces: the udaf path deserializes every input row through an
  * `ExpressionEncoder` into a boxed `(Long, Double)` and re-boxes the
  * buffer array on each `reduce` — measured at ~25 µs/row, it was the
  * single largest term in the ANN family's wall time (pq_topk tail 0.48 s
  * for 16 k exploded rows at sf0.1). This form reads the two columns
  * straight off the `InternalRow` into primitive arrays — no encoder, no
  * boxing, no per-row allocation — while keeping the identical
  * partial-aggregation shape (map tasks still reduce their slice to ≤ k
  * rows per group before the shuffle, the property the window form lacks at
  * 100 TB). Output order and tie behavior are bit-identical, so every
  * hash-pinned catalog row is unchanged.
  *
  * Null inputs are skipped (the udaf face rejected them with an encoder
  * error; no pipeline here produces them — scores are rounded cosines or
  * literal sentinels, ids are keys).
  */
case class TopKPairsAgg(
    id: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsAgg.Buf] with BinaryLike[Expression] {

  require(k > 0, s"topk_pairs needs k > 0, got $k")

  override def left: Expression = id
  override def right: Expression = score

  override def createAggregationBuffer(): TopKPairsAgg.Buf =
    new TopKPairsAgg.Buf(k)

  override def update(buf: TopKPairsAgg.Buf, input: InternalRow): TopKPairsAgg.Buf = {
    val i = id.eval(input)
    val s = score.eval(input)
    if (i != null && s != null)
      buf.add(i.asInstanceOf[Long], s.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKPairsAgg.Buf, other: TopKPairsAgg.Buf): TopKPairsAgg.Buf = {
    var i = 0
    while (i < other.n) { buf.add(other.ids(i), other.scores(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKPairsAgg.Buf): Any = {
    buf.trim()
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.ids(i), buf.scores(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKPairsAgg.Buf): Array[Byte] = {
    buf.trim() // ship ≤ k pairs, never the working buffer
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKPairsAgg.Buf(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("_1", LongType, nullable = false),
      StructField("_2", DoubleType, nullable = false))),
    containsNull = false)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(id = newLeft, score = newRight)
  override def prettyName: String = "topk_pairs"
}

object TopKPairsAgg {

  /** Grouped top-k pairs Column face: `array<struct<_1:bigint,_2:double>>`
    * of the k best (id, score) by (score desc, id asc).
    */
  def topkPairs(k: Int, id: Column, score: Column): Column =
    ExpressionUtils.column(
      TopKPairsAgg(ExpressionUtils.expression(id),
                   ExpressionUtils.expression(score), k)
        .toAggregateExpression())

  /** Primitive-array top-k buffer with the amortized trim bound. */
  final class Buf(val k: Int) {
    private val cap = 2 * math.max(k, 16)
    var ids = new Array[Long](cap)
    var scores = new Array[Double](cap)
    var n = 0

    def add(id: Long, score: Double): Unit = {
      ids(n) = id; scores(n) = score; n += 1
      if (n >= cap) trim()
    }

    /** Compact to the ≤ k best by (score desc, id asc) — the exact
      * comparator of the original Aggregator's `best`.
      */
    def trim(): Unit = {
      if (n <= k && isSorted) return
      val idx = Array.range(0, n).sortWith { (a, b) =>
        scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
      }
      val m = math.min(k, n)
      val nids = new Array[Long](cap)
      val nscores = new Array[Double](cap)
      var i = 0
      while (i < m) { nids(i) = ids(idx(i)); nscores(i) = scores(idx(i)); i += 1 }
      ids = nids; scores = nscores; n = m
    }

    private def isSorted: Boolean = {
      var i = 1
      while (i < n) {
        val ok = scores(i - 1) > scores(i) ||
          (scores(i - 1) == scores(i) && ids(i - 1) < ids(i))
        if (!ok) return false
        i += 1
      }
      true
    }
  }
}
