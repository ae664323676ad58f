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

  /** Key-skew profile — the DECISION INPUT for everything else in this
    * file: Gini concentration, top-1%-of-keys row share, and Herfindahl
    * index over the per-key row counts of a grouping column. A shuffle
    * planner (or a human sizing salt factors / AQE skew thresholds) reads
    * this one row to know whether `key` distributes or concentrates.
    *
    * Exact at any scale WITHOUT a global sort of the key space: the
    * per-key counts reduce to COUNTS-OF-COUNTS (distinct count value c →
    * number of keys k holding it), and every rank-weighted statistic has
    * a closed form over equal-count blocks — keys ranked ascending by
    * count, a block occupying ranks [kb+1, kb+k] contributes
    * c·(2·kb+k+1)·k/2 to Σ rank·count (the Gini numerator; the product is
    * always even, so the halving is exact integer arithmetic via an
    * arithmetic shift), and the top-m cut takes min(k, max(m−kt, 0)) keys
    * from each block walking descending. Within-block order is
    * irrelevant — equal counts contribute identically — so no tie-break
    * convention is even needed. The windows run over the counts-of-counts
    * relation, bounded by DISTINCT COUNT VALUES (≤ O(√n_rows) for any
    * real distribution, pathologically ≤ n_keys); the corpus-sized work
    * is one partial+final count aggregate.
    *
    * Overflow headroom (BIGINT sums): Σ rank·count ≤ n_keys·n_rows and
    * Σ c²·k ≤ max_count·n_rows — both under 2⁶³ while
    * n_keys·n_rows < 9·10¹⁸ (e.g. 10⁹ keys × 10⁹ rows); beyond that,
    * apply the [[Stats.pearsonOlsFixed]] split-accumulation.
    *
    * Emits one row: (n_keys, n_rows, max_count, gini, top1pct_share,
    * hhi) — gini in [0,1) (0 = uniform), top1pct_share the row fraction
    * held by the ceil(1%) most loaded keys, hhi = Σ(c/n_rows)².
    */
  def keySkewProfile(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("k"))
    val asc = Window.orderBy(col("c").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val desc = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val blocks = cc
      .withColumn("kb", coalesce(sum(col("k")).over(asc), lit(0L)))
      .withColumn("kt", coalesce(sum(col("k")).over(desc), lit(0L)))
      .withColumn("nk", sum(col("k")).over(
        Window.orderBy(col("c")).rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing)))
    // m = ceil(n_keys/100) via integer div; take min(k, max(m - kt, 0))
    // keys of this block into the top-1% cut (all integer arithmetic)
    val take = least(col("k"),
      greatest(expr("(nk + 99) div 100") - col("kt"), lit(0L)))
    val agg = blocks.agg(
      max(col("nk")).as("n_keys"),
      sum(col("k") * col("c")).as("n_rows"),
      max(col("c")).as("max_count"),
      sum(col("c") * shiftright((lit(2L) * col("kb") + col("k") + lit(1L))
        * col("k"), 1)).as("s"),
      sum(col("c") * col("c") * col("k")).as("sc2"),
      sum(take * col("c")).as("top_rows"))
    agg.select(col("n_keys"), col("n_rows"), col("max_count"),
      round(lit(2.0) * col("s").cast("double")
          / (col("n_keys").cast("double") * col("n_rows").cast("double"))
        - (col("n_keys") + 1L).cast("double") / col("n_keys").cast("double"),
        6).as("gini"),
      round(col("top_rows").cast("double") / col("n_rows").cast("double"), 6)
        .as("top1pct_share"),
      round(col("sc2").cast("double")
          / (col("n_rows").cast("double") * col("n_rows").cast("double")), 6)
        .as("hhi"))
  }
}
