package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY §2.10's reserved custom
  * `Aggregator[IN, BUF, OUT]`): keeps the k best (score, id) pairs per group
  * with a bounded buffer. This is the typed `Dataset` face (`.toColumn` in
  * typed pipelines — FetchTopKSpec); the catalog hot paths (ANN rescoring,
  * stratified sampling, KMV) route through the contract-identical native
  * [[org.apache.spark.sql.graft.TopKPairsAgg]], which skips the
  * per-row encoder round-trip this face pays under the untyped `udaf`
  * wrapper (measured ~25 µs/row — the largest single term in the ANN
  * family's wall time at sf0.1).
  *
  * Scale rationale (both faces): the ranking-window top-k (`row_number ≤ k`)
  * shuffles *every* candidate row to its group's partition before ranking;
  * this aggregator participates in partial aggregation, so each map task
  * reduces its slice to ≤ k rows before the shuffle — for ANN rescoring
  * with millions of candidates per query, the shuffle shrinks by orders of
  * magnitude. Ties break toward the smaller id (same total order as the
  * window form).
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), Array[(Long, Double)], Array[(Long, Double)]] {

  private def best(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(buf: Array[(Long, Double)]): Array[(Long, Double)] =
    buf.sortWith(best).take(k)

  // amortized trim bound: let the buffer grow to 2·max(k,16) before
  // sorting — a sort per ROW is O(k log k)/row and measured 2.6 s on the
  // k=256 kmv row (k=5 rows never noticed); deferring it amortizes to
  // O(log k)/row while keeping the true top-k (any element trimmed out is
  // beaten by k better ones, so it can never re-enter)
  private val cap = 2 * math.max(k, 16)

  override def zero: Array[(Long, Double)] = Array.empty
  override def reduce(buf: Array[(Long, Double)], row: (Long, Double)): Array[(Long, Double)] = {
    val appended = buf :+ row
    if (appended.length >= cap) trim(appended) else appended
  }
  override def merge(a: Array[(Long, Double)], b: Array[(Long, Double)]): Array[(Long, Double)] =
    trim(a ++ b)
  override def finish(buf: Array[(Long, Double)]): Array[(Long, Double)] = trim(buf)

  override def bufferEncoder: Encoder[Array[(Long, Double)]] =
    Encoders.kryo[Array[(Long, Double)]]
  // Product encoder (not kryo): the untyped `udaf` face then yields a real
  // `array<struct<_1,_2>>` column that SQL can explode — kryo output would
  // surface as opaque binary and trap the result in typed code.
  override def outputEncoder: Encoder[Array[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Double)]]()
}
