package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Daily compaction (SURVEY.md §2.1 S5/S6, §2.4 A4; reference
  * tasks/compaction.py:65-266).
  *
  * The reference rewrites an entire per-day JSON array on every append
  * (compaction.py:219-225 — O(day²) behavior). The Spark-native form is
  * date-partitioned parquet with *dynamic partition overwrite*: only the
  * partitions present in the incoming batch are rewritten, each as
  * `existing ∪ incoming` deduped by id. At 100 TB this touches only the days
  * that received data, and each day rewrites in parallel across executors.
  */
object Compaction {

  /** A4 — compaction planning (get_replays_by_date, db.py:666-700): group
    * downloaded-not-compacted work by (format, day) with a deterministic
    * id list per group.
    */
  def plan(status: DataFrame): DataFrame =
    status.filter(col("is_downloaded") && !col("is_compacted"))
      .groupBy(col("format_id"),
               Scalars.epochToDate(col("uploadtime")).as("day"))
      .agg(count(lit(1)).as("n"),
           array_join(sort_array(collect_list(col("replay_id"))), ",").as("ids_csv"))

  /** S5/U1/U5 — compact one batch into a date-partitioned parquet dataset:
    * union with what's already there, dedup by key (keep the newest by
    * `precedenceCol` desc, then `tiebreak` — which must totally order rows
    * sharing (key, precedenceCol), or the survivor is partition-order
    * dependent), rewrite only the partitions the batch touches.
    */
  def compact(spark: SparkSession, incoming: DataFrame, path: String,
              key: String, precedenceCol: String,
              tiebreak: Seq[org.apache.spark.sql.Column] = Seq.empty): Unit = {
    val partitioned = incoming
      .withColumn("day", Scalars.epochToDate(col("uploadtime")))
    // Only "dataset does not exist yet" maps to None — any other read
    // failure must abort: treating it as empty would dynamic-overwrite the
    // touched partitions with incoming-only data and drop compacted history.
    //
    // The touched-partition restriction is a STATIC partition predicate,
    // not a semi-join: the touched set is bounded by the batch's
    // formats × days (the reference's batches are per-day slices), so it
    // collects driver-side and the OR-chain of partition-column equalities
    // prunes at the file index — the scan lists only touched directories.
    // The semi-join form read the ENTIRE compacted dataset to keep the
    // rows a partition filter eliminates for free; at 100 TB that is a
    // full-table read per daily batch. A batch touching >1000 partitions
    // falls back to the semi-join (an OR-chain that wide plans worse than
    // one shuffle).
    val existing =
      try {
        val ds = spark.read.parquet(path)
        val touched = partitioned.select("format_id", "day").distinct().collect()
        if (touched.nonEmpty && touched.length <= 1000)
          Some(ds.filter(touched.map(r =>
            col("format_id") === lit(r.get(0)) && col("day") === lit(r.get(1)))
            .reduce(_ || _)))
        else
          Some(ds.join(partitioned.select("format_id", "day").distinct(),
                       Seq("format_id", "day"), "left_semi"))
      }
      catch {
        // PATH_NOT_FOUND: no directory; UNABLE_TO_INFER_SCHEMA: dir exists
        // but holds no parquet yet — both mean "first compaction here"
        case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("PATH_NOT_FOUND") ||
             e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => None
      }
    val all = existing match {
      case Some(ex) => ex.selectExpr(partitioned.columns.toIndexedSeq.map(c => s"`$c`"): _*)
        .unionByName(partitioned)
      case None => partitioned
    }
    val merged = Lifecycle.dedupKeepFirst(all, Seq(key),
        Seq(col(precedenceCol).desc) ++ tiebreak ++ Seq(col(key)))
      // One shuffle on the partition columns so each (format, day) directory
      // is written by exactly one task — without it, partitionBy fans every
      // write task across every touched directory (tasks × days small
      // files: the classic 1000-executor small-files failure; measured
      // locally 32 tasks × ~30 days ≈ 1000 files and 8.6 s → ~150 files).
      // A day whose data outgrows one task would cap via maxRecordsPerFile
      // at the writer — per-day volume is bounded by a day's ingest here,
      // same as the reference's whole-day rewrite (compaction.py:219-225).
      .repartition(col("format_id"), col("day"))
    // Materialize before overwriting partitions we just read from (plan-safe
    // at this scale; a production deployment stages to a temp prefix and
    // swaps atomically). Only needed when an existing dataset was read:
    // a first write has no read-overwrite hazard, so it streams straight
    // from the incoming batch with no cache + count pass.
    val rows = if (existing.isDefined) { val r = merged.cache(); r.count(); r }
               else merged
    rows.write.mode("overwrite")
      // writer-scoped dynamic overwrite: only partitions present in `rows`
      // are replaced, and the shared session's conf is left untouched
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("format_id", "day").parquet(path)
    if (existing.isDefined) rows.unpersist()
  }
}
