package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological (one
  * format/day holding most of the stream). AQE's skew-join split handles the
  * sort-merge case automatically; this explicit salted form covers what AQE
  * can't — aggregation-side skew and deterministic plans — and documents the
  * technique the engine reaches for at 100 TB.
  */
object Skew {

  /** Salted equi-join of a skewed `left` against a smaller `right`:
    * `left` rows get a deterministic salt in [0, factor) from a hash of
    * their whole row; `right` is replicated `factor` times; the join key
    * becomes (key, salt), splitting each hot key across `factor` reducers.
    * Deterministic (hash-based salt, no rand()) so re-runs produce identical
    * partitioning. Result equals the plain join row-for-row.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(factor)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt) then
    * final aggregate on key. For algebraic aggregates (sum/count) this is
    * exactly what partial aggregation already does — the explicit form
    * matters for the non-algebraic ones (e.g. collect_list caps, exact
    * distinct) where one hot key would otherwise land on one reducer.
    */
  def saltedCount(df: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    df.withColumn("__salt", pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(factor)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__n"))
      .groupBy(col(key)).agg(sum(col("__n")).as("n"))
  }
}
