package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2.5/§2.6): latest-row-per-key, top-k,
  * rolling frames, pagination cursors. The reference runs these as per-key
  * loops + `ORDER BY … LIMIT 1` (db.py:133-154) — here they are ranking
  * windows, one shuffle on the partition key.
  */
object Windows {

  /** W1 — latest row per key (db.py:133-154). `precedence` must be a total
    * order (include a unique tie-breaker) for deterministic output.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], precedence: Seq[Column]): DataFrame =
    Lifecycle.dedupKeepFirst(df, keys, precedence)

  /** O1 — global top-k under a total order. Spark plans this as
    * TakeOrderedAndProject: per-partition heaps + a k-row driver merge, no
    * global sort — this is the scalable form of `ORDER BY … LIMIT k`.
    */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Rolling frame over a pre-aggregated daily series: sum of the last
    * `days` rows per partition (the reference has no frame windows; this is
    * the added analytics surface from SURVEY §2.5). Returns a Column — apply
    * with `withColumn` on the series it should range over.
    */
  def rollingSum(partition: Seq[String], orderCol: String,
                 valueCol: String, days: Int): Column = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-(days - 1), Window.currentRow)
    sum(col(valueCol)).over(w)
  }

  /** W2/T2 — pagination plan over a descending event-time order
    * (discovery.py:112-113): assign each row to a fixed-size page and emit
    * per-page cursor stats. Partitioned by a stream key so the ranking window
    * scales; `pageSize` mirrors the reference's 51-row API pages.
    */
  def paginate(df: DataFrame, partition: Seq[String], order: Seq[Column],
               pageSize: Int): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order: _*)
    df.withColumn("page", ((row_number().over(w) - 1) / pageSize).cast("long"))
  }

  /** Ordered funnel per key: the earliest time each stage completes,
    * where stage i+1 must occur STRICTLY after stage i (the product-
    * analytics conversion funnel). Stage 1 is a plain conditional min; each
    * later stage joins the per-key frontier so far (an aggregated, per-key
    * relation — broadcastable when the key space allows) and conditional-
    * mins again. `stages.size − 1` shuffles on the key, each over one
    * already-aggregated side + one filtered event subset — never a window
    * over the raw stream. Unreached stages are NULL and stay NULL for all
    * later stages (left joins keep every key that reached stage 1).
    */
  def funnelStages(events: DataFrame, key: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(key))
      .agg(min(col(tsCol)).as("t1"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (stage, i)) =>
      val nxt = events.filter(col(typeCol) === stage)
        .select(col(key), col(tsCol).as("__ts"))
        .join(acc.select(col(key), col(s"t$i").as("__prev")), Seq(key))
        .filter(col("__ts") > col("__prev"))
        .groupBy(col(key))
        .agg(min(col("__ts")).as(s"t${i + 1}"))
      acc.join(nxt, Seq(key), "left_outer")
    }
  }

  /** SCD2-style status history: compress a per-key ordered event stream to
    * its change points and emit validity intervals — a row per maximal run
    * of an unchanged `statusCol`, with `valid_from` = first ts of the run
    * and `valid_to` = the next run's start (NULL for the current status).
    * Two stacked window passes on ONE shuffle of (key): lag to mark change
    * points, running count to number runs, then a per-run aggregate +
    * lead for the closing timestamp. `tiebreak` must complete a total
    * order for deterministic runs at equal timestamps.
    */
  def statusHistory(events: DataFrame, key: String, tsCol: String,
                    statusCol: String, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), tiebreak)
    val runs = events
      .withColumn("__chg",
        when(lag(col(statusCol), 1).over(w).isNull ||
             lag(col(statusCol), 1).over(w) =!= col(statusCol), 1L)
          .otherwise(0L))
      .withColumn("__run",
        sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)))
      .groupBy(col(key), col("__run"))
      .agg(min(col(statusCol)).as("status"), // constant within a run
           min(col(tsCol)).as("valid_from"),
           count(lit(1)).as("n_events"))
    val wr = Window.partitionBy(col(key)).orderBy(col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .select(col(key), col("__run").as("run_no"), col("status"),
              col("valid_from"), col("valid_to"), col("n_events"))
  }
}
