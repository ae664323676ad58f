package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact money allocation: prorate an integer total across the members of a
  * group so the parts sum back to the whole EXACTLY. Floating-point
  * proration (`total * q_i / Q`) leaks cents on every order — the classic
  * ledger reconciliation bug; the largest-remainder (Hamilton) method is
  * the standard fix: floor the proportional integer shares, then hand the
  * leftover cents to the largest fractional remainders under a total
  * order.
  */
object Allocate {

  /** Largest-remainder allocation of `totalInt` (constant within a group)
    * across the group's rows, proportional to `weightInt`:
    *
    *   share_i  = ⌊total·w_i / W⌋           (exact integer)
    *   rem_i    = total·w_i − share_i·W     (the fractional part, ×W)
    *   leftover = total − Σ share_i         (< group size)
    *
    * and the `leftover` rows ranking first by (rem desc, tiebreak asc)
    * receive one extra unit. Σ alloc ≡ total per group BY CONSTRUCTION —
    * the invariant the op exists for, surfaced as `bumped` so an audit can
    * see exactly which rows absorbed the rounding.
    *
    * Exactness/overflow: everything is BIGINT; per-row products total·w
    * must fit 2⁶³ (cents·quantity ≈ 2³⁰·2⁶ here — orders of magnitude of
    * headroom). Scale: two windows over the SAME group partitioning (sum +
    * rank — one shuffle on the group key, no join), then map-side
    * arithmetic; groups are orders, rows per group bounded by order size.
    * `tiebreak` must totally order rows within a group.
    */
  def largestRemainder(df: DataFrame, groupCol: String, totalInt: Column,
                       weightInt: Column, tiebreaks: Seq[Column]): DataFrame = {
    // `tiebreaks` need only totalize rows whose remainder AND emitted
    // columns could otherwise swap: rows identical in every output column
    // may tie freely — any k of them bumping yields the same row multiset
    val wg = Window.partitionBy(col(groupCol))
    val based = df
      .withColumn("__total", totalInt)
      .withColumn("__w", weightInt)
      // NOT "__W": Spark's resolver is case-insensitive by default, and a
      // name differing only in case silently aliases the weight column
      .withColumn("__wsum", sum(col("__w")).over(wg))
    val share = expr("(__total * __w) div __wsum")
    val ranked = based
      .withColumn("__share", share)
      .withColumn("__rem",
        col("__total") * col("__w") - col("__share") * col("__wsum"))
      .withColumn("__leftover", col("__total") - sum(col("__share")).over(wg))
      .withColumn("__rk",
        row_number().over(wg.orderBy(col("__rem").desc +: tiebreaks: _*)))
    ranked
      .withColumn("bumped", (col("__rk") <= col("__leftover")).cast("boolean"))
      .withColumn("alloc",
        col("__share") + when(col("bumped"), 1L).otherwise(0L))
      .drop("__total", "__w", "__wsum", "__share", "__rem", "__leftover", "__rk")
  }

  /** Linear multi-touch attribution with EXACT credit conservation: each
    * purchase's `creditUnits` micro-credits split equally across the
    * user's view/click touchpoints in the preceding `windowSeconds` —
    * equal split via [[largestRemainder]] (weight 1 per touch, leftover
    * micro-credits to the earliest touches), so Σ credit ≡ purchases ×
    * creditUnits to the last unit, with purchases that had NO touch in
    * window reported as an explicit `(unattributed)` row (silently
    * dropping them is the classic attribution-report bug). Emits one row
    * per touch type: touch count and total micro-credit.
    *
    * Shape: the purchase×touch pair join is an equi-join on the user with
    * a residual time-range predicate — pairs are bounded by per-user
    * activity × window, the prior-window family; the split is two windows
    * on the purchase key; the report aggregate is domain-bounded.
    */
  def linearAttribution(events: DataFrame, windowSeconds: Long = 7 * 86400L,
                        creditUnits: Long = 1000000L): DataFrame = {
    val winMicros = windowSeconds * 1000000L
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
              unix_micros(col("ts")).as("p_us"))
    val t = events.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_user"), col("event_id").as("t_id"),
              col("event_type").as("touch_type"), unix_micros(col("ts")).as("t_us"))
    val pairs = p.join(t,
      col("p_user") === col("t_user") &&
        col("t_us") >= col("p_us") - winMicros && col("t_us") < col("p_us"))
    // Round-13 surgery: the `(unattributed)` row used to be a left-anti
    // join of p against DISTINCT pair purchase ids — a SECOND execution
    // of the whole pairs join (plan audit: 5 events scans for a ≤3-row
    // report). Credit conservation makes it arithmetic instead: Σ alloc
    // ≡ creditUnits per attributed purchase (the largestRemainder
    // contract this op exists to provide, spec-pinned), so the number of
    // attributed purchases IS Σ credit_micro / creditUnits exactly, and
    // unattributed = total purchases − that. The report is ≤ 3 rows by
    // construction (touch_type ∈ {view, click} + the unattributed row),
    // so it assembles on the driver unconditionally: one run of the pair
    // chain, one column-pruned purchase count, zero re-scans.
    val attRows =
      largestRemainder(pairs, "p_id", lit(creditUnits), lit(1L),
          Seq(col("t_us"), col("t_id")))
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_touches"), sum(col("alloc")).as("credit_micro"))
        .collect()
    val np = p.agg(count(lit(1))).head().getLong(0)
    val nAttributed = attRows.map(_.getLong(2)).sum / creditUnits
    val out = attRows.toSeq :+ org.apache.spark.sql.Row(
      "(unattributed)", np - nAttributed, (np - nAttributed) * creditUnits)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("touch_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_touches",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("credit_micro",
        org.apache.spark.sql.types.LongType)))
    import scala.jdk.CollectionConverters._
    events.sparkSession.createDataFrame(out.toList.asJava, schema)
  }

  /** Exact Shapley-value channel attribution (the data-driven attribution
    * model behind e.g. Google's DDA — Shapley 1953 applied to coalition
    * conversion rates): each user contributes their observed channel
    * COALITION (which of view/click/signup they touched) and whether they
    * converted; the characteristic function v(S) is the conversion rate of
    * users whose coalition is exactly S (0 for unobserved coalitions), and
    * channel i earns φᵢ = Σ_S |S|!(|C|−|S|−1)!/|C|!·(v(S∪i) − v(S)) — the
    * only credit split that is efficient (Σφ = v(C) − v(∅)), symmetric,
    * and null-player-zero, which position rules (first/last/linear touch)
    * all violate.
    *
    * Exactness: v(S) is a half-up integer micro-rate ((k·2·10⁶ + n) div
    * 2n); with |C| = 3 the Shapley weights are {2,1,1,2}/6, so 6·φ is pure
    * BIGINT arithmetic on the eight micro-rates and only the final φ is
    * one mirrored division. Shape: ONE corpus aggregate to user grain
    * (map-side partial max flags), an 8-row coalition grid, a 1-row pivot,
    * three output rows — scale-free past the first aggregate.
    */
  def shapleyChannelAttribution(events: DataFrame): DataFrame = {
    val u = events.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "view", 1L).otherwise(0L)).as("hv"),
           max(when(col("event_type") === "click", 1L).otherwise(0L)).as("hc"),
           max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("hs"),
           max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("cv"))
    val grid = u.groupBy(col("hv"), col("hc"), col("hs"))
      .agg(count(lit(1)).as("n"), sum(col("cv")).as("k"))
      .withColumn("r", expr("(k * 2000000 + n) div (2 * n)"))
    def rAt(v: Int, c: Int, s: Int) = coalesce(
      max(when(col("hv") === v && col("hc") === c && col("hs") === s,
        col("r"))), lit(0L))
    val p = grid.agg(
      rAt(0, 0, 0).as("r000"), rAt(1, 0, 0).as("r100"),
      rAt(0, 1, 0).as("r010"), rAt(0, 0, 1).as("r001"),
      rAt(1, 1, 0).as("r110"), rAt(1, 0, 1).as("r101"),
      rAt(0, 1, 1).as("r011"), rAt(1, 1, 1).as("r111"))
    def phi6(solo: String, base: String, withA: String, aOnly: String,
             withB: String, bOnly: String, full: String, rest: String) =
      lit(2L) * (col(solo) - col(base)) + (col(withA) - col(aOnly)) +
        (col(withB) - col(bOnly)) + lit(2L) * (col(full) - col(rest))
    val rows = p.select(
      phi6("r100", "r000", "r110", "r010", "r101", "r001", "r111", "r011")
        .as("view"),
      phi6("r010", "r000", "r110", "r100", "r011", "r001", "r111", "r101")
        .as("click"),
      phi6("r001", "r000", "r101", "r100", "r011", "r010", "r111", "r110")
        .as("signup"))
    rows.select(expr(
        "stack(3, 'click', click, 'signup', signup, 'view', view) AS (channel, phi_micro6)"))
      .select(col("channel"), col("phi_micro6"),
        round(col("phi_micro6").cast("double") / lit(6000000.0), 6).as("phi"))
      .orderBy(col("channel"))
  }
}
