package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped statistical fits with engine-portable determinism. Spark's own
  * `corr`/`covar_samp` aggregate doubles in partition order —
  * non-associative, so two runs (or two engines) can disagree in the last
  * ulps and break a hash gate. Here the five moment sums accumulate as
  * exact BIGINTs over integer-encoded inputs (the [[Scalars.moneySum]]
  * discipline applied to second moments); only the final per-group
  * projection converts to double, where every +,·,÷,√ is an IEEE-defined
  * op on identical operands in any engine.
  */
object Stats {

  /** Per-group Pearson correlation and OLS slope of `yInt` on `xInt`.
    * `xInt`/`yInt` MUST already be integer-valued BIGINT columns (e.g.
    * quantities, money cents) — exactness of the moment sums is the whole
    * contract. Emits (groups..., n, corr, slope): `corr` the product-moment
    * coefficient, `slope` the least-squares β in y-units per x-unit, both
    * rounded to 6 decimals, NULL on zero variance.
    *
    * Overflow headroom: Σy² is the binding term — with y ≤ 2³⁰ (money
    * cents up to ~$10 M) the BIGINT sum holds ~2⁶³⁻⁶⁰ ≈ 8·10³ G rows per
    * group; beyond that, widen the accumulators to decimal(38,0) (same
    * plan, same determinism, ~20% slower partial agg).
    *
    * Scale shape: one partial+final hash aggregate — map-side combine
    * reduces every partition to 6 numbers per group before the shuffle,
    * so shuffle volume is groups × 6 regardless of row count.
    */
  def pearsonOlsFixed(df: DataFrame, groupCols: Seq[String],
                      xInt: Column, yInt: Column): DataFrame = {
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
           sum(xInt).as("sx"), sum(yInt).as("sy"),
           sum(xInt * xInt).as("sxx"), sum(yInt * yInt).as("syy"),
           sum(xInt * yInt).as("sxy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    // explicit association, mirrored verbatim in the SQL twins
    val varX = nD * d("sxx") - d("sx") * d("sx")
    val varY = nD * d("syy") - d("sy") * d("sy")
    val cov = nD * d("sxy") - d("sx") * d("sy")
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        when(varX === 0.0 || varY === 0.0, lit(null))
          .otherwise(round(cov / (sqrt(varX) * sqrt(varY)), 6)).as("corr"),
        when(varX === 0.0, lit(null))
          .otherwise(round(cov / varX, 6)).as("slope")): _*)
  }
}
