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
}
