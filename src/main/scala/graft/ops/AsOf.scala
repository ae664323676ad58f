package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` per key. Spark has no native operator; per the
  * build guidance the first resort is composing built-ins: tag both sides,
  * union, and carry the last right payload forward with an
  * `ignoreNulls` window — one shuffle on (key), no range explosion, exactly
  * the plan a custom `SparkStrategy` would emit for the sort-merge as-of.
  *
  * The reference's cursor pagination ("rows strictly before the previous
  * page's oldest", discovery.py:112-113) is the degenerate single-key form.
  */
object AsOf {

  /** `payload` names the right-side columns to carry (left keeps all its
    * columns). Right rows sort before left rows at equal timestamps, so a
    * right row exactly at `left.ts` is visible to it (DuckDB ASOF
    * `left.ts >= right.ts` semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__r", lit(null).cast(
        right.select(payload.map(col): _*).schema.catalogString))
      .withColumn("__src", lit(1))
    val r = right.select(
        (Seq(col(key), col(tsCol)) :+ struct(payload.map(col): _*).as("__r")): _*)
      .withColumn("__src", lit(0))
    val unioned = l.select((Seq(col(key), col(tsCol), col("__r"), col("__src")) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__last",
        // NULL keys never match (ASOF `l.k = r.k` semantics): the window
        // partitions NULL keys together, so mask the carried payload there
        when(col(key).isNotNull,
             last(col("__r"), ignoreNulls = true).over(w)))
      .filter(col("__src") === 1)
      .select((leftCols.map(col) ++ payload.map(p => col(s"__last.$p").as(s"asof_$p"))).toIndexedSeq: _*)
  }

  /** Sessionize an event stream: a new session starts after `gapSeconds` of
    * per-key inactivity. Window lag + running sum — one shuffle on the key.
    */
  def sessionize(events: DataFrame, key: String, tsCol: String,
                 orderTiebreak: Column, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), orderTiebreak)
    val epoch = unix_seconds(col(tsCol))
    val gap = epoch - lag(epoch, 1).over(w)
    events
      .withColumn("__new", when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_no",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Bucketed interval (range) join: for each probe row, count build rows of
    * the same key with `build.ts ∈ [probe.ts − windowSeconds, probe.ts)`.
    *
    * Spark has no native range join; the naive non-equi join plans as a
    * broadcast-nested-loop — O(probe × build) per key and a scale killer.
    * Instead both sides are bucketed at the window width: the half-open
    * prior window spans at most two buckets, so the probe explodes into
    * exactly 2 candidate bucket keys and the join is a plain shuffle
    * equi-join on (key, bucket) + a residual range filter. Shuffle volume is
    * 2×probe + build; per-group size is the per-key event rate over one
    * window — bounded, no skew beyond the key distribution itself.
    *
    * Returns the probe rows (all columns) plus `n_prior` (0 when the window
    * is empty — the left join keeps empty-window probes).
    */
  def priorWindowCounts(probe: DataFrame, build: DataFrame, key: String,
                        tsCol: String, idCol: String,
                        windowSeconds: Long): DataFrame = {
    val w = windowSeconds * 1000000L // exact epoch-micros arithmetic
    val probeKeyed = probe
      .withColumn("__pe", unix_micros(col(tsCol)))
      .withColumn("__bucket",
        explode(array(floor(col("__pe") / w) - 1, floor(col("__pe") / w))))
      .select(col(key).as("__k"), col("__bucket"), col("__pe"),
              col(idCol).as("__pid"))
    val buildKeyed = build
      .withColumn("__be", unix_micros(col(tsCol)))
      .select(col(key).as("__k"), floor(col("__be") / w).as("__bucket"),
              col("__be"))
    val counts = probeKeyed
      .join(buildKeyed, Seq("__k", "__bucket"))
      .filter(col("__be") >= col("__pe") - w && col("__be") < col("__pe"))
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("n_prior"))
    probe
      .join(counts, probe(idCol) === counts("__pid"), "left_outer")
      .drop("__pid")
      .withColumn("n_prior", coalesce(col("n_prior"), lit(0L)))
  }
}
