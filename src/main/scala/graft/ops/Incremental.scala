package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-ingest semantics (SURVEY.md §2.9, T1–T4): the reference is a
  * micro-batch high-watermark system — resume from `MAX(uploadtime)` going
  * forward (discovery.py:42-52,82-100) and from `MIN(uploadtime)` going
  * backward for backfill (discovery.py:159-211).
  *
  * In Spark the cursor queries are single partial+final aggregates (one
  * row to the driver), and the watermark filter is a pushed-down predicate —
  * at 100 TB with the stream date-partitioned, it's partition pruning.
  */
object Incremental {

  /** A1 — forward high-watermark per stream key. */
  def highWatermark(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(max(col(tsCol)).as("last_seen_ts"))

  /** A2 — backfill low-watermark per stream key. */
  def lowWatermark(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(min(col(tsCol)).as("oldest_ts"))

  /** P5/T1 — keep only records strictly newer than the watermark (the
    * filter the reference applies row-by-row while paging,
    * discovery.py:82-100). Pushed to the scan by Catalyst.
    */
  def newSince(df: DataFrame, tsCol: String, watermark: Column): DataFrame =
    df.filter(col(tsCol) > watermark)

  /** T2 — backfill slice: records strictly older than the oldest seen. */
  def olderThan(df: DataFrame, tsCol: String, oldest: Column): DataFrame =
    df.filter(col(tsCol) < oldest)
}
