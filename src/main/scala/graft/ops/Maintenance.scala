package graft.ops

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** M3 ops surface — the reference's state-maintenance scripts re-expressed
  * over a parquet state directory:
  *
  *  - per-format discovery-state reset (`reset_format_state.py:25-48` and
  *    the legacy `{format}_state.json` of `state.py:31-36`);
  *  - timestamped backup before any repair (`reset_format_state.py:57-61`);
  *  - VACUUM/repair as copy-compact-swap (`reset_format_state.py:63-137`:
  *    copy live rows to a fresh store, optimize, atomically replace);
  *  - integrity audit (duplicate keys / null ids — the `cleanup` script's
  *    pre-repair report).
  *
  * All file manipulation goes through the Hadoop FileSystem API resolved
  * from the path, so the same code runs on local disk, HDFS, or an object
  * store. The rewrite itself is a distributed scan→write (never a
  * driver-side row loop — the reference pages rows 1000 at a time through
  * the driver; here compaction is one Spark job of any size). Timestamps
  * are injected, never wall-clock, so every operation is reproducible.
  */
object Maintenance {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Canonical reset per-format discovery state (reference
    * `reset_format_state.py:34-41`): the next run refetches from the start.
    */
  def defaultFormatState(formatId: String): String =
    s"""{"format_id":"$formatId","last_seen_ts":0,"oldest_ts":null,"last_processed_id":null}"""

  /** Reset the per-format state JSON. With `dryRun = true` nothing is
    * written; the would-be content is returned either way.
    */
  def resetFormatState(spark: SparkSession, dir: String, formatId: String,
                       dryRun: Boolean = false): String = {
    val content = defaultFormatState(formatId)
    if (!dryRun) {
      val p = new Path(dir, s"${formatId}_state.json")
      val out = fs(spark, dir).create(p, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    content
  }

  /** Read a per-format state JSON back as one typed row. */
  def readFormatState(spark: SparkSession, dir: String, formatId: String): DataFrame =
    spark.read
      .schema("format_id STRING, last_seen_ts BIGINT, oldest_ts BIGINT, last_processed_id STRING")
      .json(s"$dir/${formatId}_state.json")
      .select("format_id", "last_seen_ts", "oldest_ts", "last_processed_id")

  /** Timestamped backup of a state directory (`<dir>.backup_<stamp>`),
    * taken before any destructive maintenance. Returns the backup path.
    */
  def backup(spark: SparkSession, stateDir: String, stamp: String): String = {
    val f = fs(spark, stateDir)
    val src = new Path(stateDir)
    val dst = new Path(s"$stateDir.backup_$stamp")
    require(f.exists(src), s"state dir not found: $stateDir")
    require(!f.exists(dst), s"backup already exists: $dst")
    FileUtil.copy(f, src, f, dst, false, spark.sparkContext.hadoopConfiguration)
    dst.toString
  }

  /** VACUUM/repair: back up, rewrite the live rows compacted into
    * `targetFiles` parquet files, then swap the rewritten store into place
    * (write to `<dir>.new`, retire the old dir, rename). Row content is
    * preserved exactly; dead space / tiny-file sprawl is dropped — the
    * parquet analogue of the reference's copy-to-new-db + VACUUM + rename.
    * Returns the backup path.
    */
  def vacuum(spark: SparkSession, stateDir: String, stamp: String,
             targetFiles: Int = 1): String = {
    val backupPath = backup(spark, stateDir, stamp)
    val f = fs(spark, stateDir)
    val tmp = new Path(s"$stateDir.new")
    if (f.exists(tmp)) f.delete(tmp, true)
    spark.read.parquet(stateDir)
      .coalesce(math.max(1, targetFiles))
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val old = new Path(s"$stateDir.old_$stamp")
    val live = new Path(stateDir)
    require(f.rename(live, old), s"could not retire $live")
    require(f.rename(tmp, live), s"could not promote $tmp")
    f.delete(old, true)
    backupPath
  }

  /** Pre-repair integrity audit: one row of store-level health counters
    * (total rows, distinct keys, rows in duplicated keys, null-key rows).
    */
  def integrityReport(state: DataFrame, key: String): DataFrame = {
    val dupKeys = state.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_rows_in_dup_keys"),
           count(lit(1)).as("n_dup_keys"))
    state.agg(count(lit(1)).as("n_rows"),
              countDistinct(col(key)).as("n_distinct_keys"),
              sum(when(col(key).isNull, 1L).otherwise(0L)).as("n_null_keys"))
      .crossJoin(dupKeys)
  }
}
