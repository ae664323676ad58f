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

  /** Read a per-format state JSON back as one typed row; absent file ⇒ the
    * canonical defaults (`state.py:27-35`: load falls back to the reset
    * state).
    */
  def readFormatState(spark: SparkSession, dir: String, formatId: String): DataFrame = {
    val p = new Path(dir, s"${formatId}_state.json")
    if (!fs(spark, dir).exists(p)) {
      import spark.implicits._
      return Seq((formatId, 0L, Option.empty[Long], Option.empty[String]))
        .toDF("format_id", "last_seen_ts", "oldest_ts", "last_processed_id")
    }
    spark.read
      .schema("format_id STRING, last_seen_ts BIGINT, oldest_ts BIGINT, last_processed_id STRING")
      .json(p.toString)
      .select("format_id", "last_seen_ts", "oldest_ts", "last_processed_id")
  }

  /** Derive the cursor state a completed run would save (`state.py:38-49`
    * save after discovery): high/low watermarks + the id at the high
    * watermark, from that format's slice of the state table.
    */
  def formatStateFromStatus(status: DataFrame, formatId: String): DataFrame =
    status.filter(col("format_id") === formatId)
      .agg(coalesce(max(col("uploadtime")), lit(0L)).as("last_seen_ts"),
           min(col("uploadtime")).as("oldest_ts"),
           max_by(col("replay_id"), struct(col("uploadtime"), col("replay_id")))
             .as("last_processed_id"))
      .select(lit(formatId).as("format_id"), col("last_seen_ts"),
              col("oldest_ts"), col("last_processed_id"))

  /** Persist a one-row state relation as the per-format JSON (the reference's
    * `save_state`). Canonical field order and minimal punctuation, so a
    * saved-then-loaded state round-trips byte-stably.
    */
  def saveFormatState(spark: SparkSession, dir: String, state: DataFrame): Unit = {
    val row = state.select("format_id", "last_seen_ts", "oldest_ts", "last_processed_id").head()
    val fmt = row.getString(0)
    def jLong(i: Int): String = if (row.isNullAt(i)) "null" else row.getLong(i).toString
    def jStr(i: Int): String = if (row.isNullAt(i)) "null" else "\"" + row.getString(i) + "\""
    val content =
      s"""{"format_id":"$fmt","last_seen_ts":${jLong(1)},"oldest_ts":${jLong(2)},"last_processed_id":${jStr(3)}}"""
    val out = fs(spark, dir).create(new Path(dir, s"${fmt}_state.json"), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

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

  /** Enumerate a state dir's backups (`<dir>.backup_<stamp>` siblings),
    * newest first — the reference's `backup_%` table listing
    * (cleanup_db.py:49-52,79-85). Stamps are `yyyyMMdd_HHmmss`, so
    * lexicographic order IS chronological order.
    */
  def listBackups(spark: SparkSession, stateDir: String): Seq[String] = {
    val f = fs(spark, stateDir)
    val live = new Path(stateDir)
    val parent = live.getParent
    if (parent == null || !f.exists(parent)) return Seq.empty
    f.listStatus(parent).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(live.getName + ".backup_"))
      .map(_.toString)
      .sorted(Ordering[String].reverse)
  }

  /** Keep-N backup retention (the reference drops every `backup_%` table,
    * cleanup_db.py:64-108; a keep-N policy is the ops-sane generalization —
    * `keep = 0` reproduces the reference's drop-all). With `dryRun = true`
    * nothing is deleted (the reference's default mode). Returns the pruned
    * (or would-be-pruned) backup paths, oldest first.
    */
  def pruneBackups(spark: SparkSession, stateDir: String, keep: Int,
                   dryRun: Boolean = false): Seq[String] = {
    require(keep >= 0, s"keep must be >= 0, got $keep")
    val doomed = listBackups(spark, stateDir).drop(keep).reverse
    if (!dryRun) {
      val f = fs(spark, stateDir)
      doomed.foreach(p => f.delete(new Path(p), true))
    }
    doomed
  }

  /** Pre-repair integrity audit: one row of store-level health counters
    * (total rows, distinct keys, rows in duplicated keys, null-key rows).
    */
  def integrityReport(state: DataFrame, key: String): DataFrame =
    // every counter derives from the per-key count relation, so the whole
    // report is ONE keyed aggregate (partial+final) + one scalar aggregate —
    // the earlier two-branch form paid a second full scan for countDistinct
    // (an expand) plus a crossJoin (measured 0.76 → ~0.4 s in suite
    // context). The null-key group participates in the dup-key counters
    // exactly as before (groupBy keeps the null group).
    state.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_rows"),
           count(when(col(key).isNotNull, 1)).as("n_distinct_keys"),
           coalesce(sum(when(col(key).isNull, col("n"))), lit(0L)).as("n_null_keys"),
           coalesce(sum(when(col("n") > 1, col("n"))), lit(0L)).as("n_rows_in_dup_keys"),
           count(when(col("n") > 1, 1)).as("n_dup_keys"))
}
