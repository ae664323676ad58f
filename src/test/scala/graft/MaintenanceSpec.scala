package graft

import graft.ops.Maintenance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def sampleState = Seq(
    ("r-1", "gen9ou", true), ("r-2", "gen9ou", false), ("r-3", "gen8ou", true))
    .toDF("replay_id", "format_id", "is_downloaded")

  test("resetFormatState writes the canonical default; dry run does not") {
    val dir = tmpDir("graft_state")
    val dry = Maintenance.resetFormatState(spark, dir, "gen9ou", dryRun = true)
    assert(dry.contains("\"last_seen_ts\":0"))
    assert(!new java.io.File(s"$dir/gen9ou_state.json").exists())
    Maintenance.resetFormatState(spark, dir, "gen9ou")
    val row = Maintenance.readFormatState(spark, dir, "gen9ou").head()
    assert(row.getString(0) == "gen9ou" && row.getLong(1) == 0L)
    assert(row.isNullAt(2) && row.isNullAt(3))
  }

  test("format-state cursor derives, saves, and round-trips (legacy state.py loop)") {
    val dir = tmpDir("graft_cursor")
    // load with no file present → canonical defaults
    val fresh = Maintenance.readFormatState(spark, dir, "gen9ou").head()
    assert(fresh.getLong(1) == 0L && fresh.isNullAt(2) && fresh.isNullAt(3))
    // derive from a status slice: watermarks + id at the high watermark
    val status = Seq(
      ("r-b", "gen9ou", 200L), ("r-a", "gen9ou", 100L), ("r-c", "gen9ou", 200L),
      ("r-z", "gen8ou", 999L))
      .toDF("replay_id", "format_id", "uploadtime")
    val derived = Maintenance.formatStateFromStatus(status, "gen9ou")
    val d = derived.head()
    assert(d.getString(0) == "gen9ou" && d.getLong(1) == 200L && d.getLong(2) == 100L)
    assert(d.getString(3) == "r-c", "ties at the high watermark break to the larger id")
    // save → load round trip
    Maintenance.saveFormatState(spark, dir, derived)
    val back = Maintenance.readFormatState(spark, dir, "gen9ou").head()
    assert(back.getString(0) == "gen9ou" && back.getLong(1) == 200L &&
           back.getLong(2) == 100L && back.getString(3) == "r-c")
  }

  test("backup retention: list newest-first, keep-N prune, dry run deletes nothing") {
    val dir = tmpDir("graft_ret") + "/state"
    sampleState.write.parquet(dir)
    val stamps = Seq("20240801_000000", "20240802_000000", "20240803_000000")
    stamps.foreach(Maintenance.backup(spark, dir, _))
    val listed = Maintenance.listBackups(spark, dir)
    assert(listed.size == 3)
    assert(listed.map(p => p.substring(p.indexOf(".backup_") + 8)) ==
           stamps.reverse, "newest first")
    // dry run: reports the two oldest, deletes nothing
    val wouldGo = Maintenance.pruneBackups(spark, dir, keep = 1, dryRun = true)
    assert(wouldGo.size == 2 && Maintenance.listBackups(spark, dir).size == 3)
    assert(wouldGo.head.endsWith(".backup_20240801_000000"), "oldest first")
    // real prune: keeps only the newest; survivors still readable
    val gone = Maintenance.pruneBackups(spark, dir, keep = 1)
    assert(gone == wouldGo)
    val left = Maintenance.listBackups(spark, dir)
    assert(left.size == 1 && left.head.endsWith(".backup_20240803_000000"))
    assert(spark.read.parquet(left.head).count() == 3)
    // keep = 0 reproduces the reference's drop-all
    assert(Maintenance.pruneBackups(spark, dir, keep = 0).size == 1)
    assert(Maintenance.listBackups(spark, dir).isEmpty)
  }

  test("backup copies the state dir; refuses to overwrite an existing backup") {
    val dir = tmpDir("graft_bk") + "/state"
    sampleState.write.parquet(dir)
    val bk = Maintenance.backup(spark, dir, "20240801_000000")
    assert(spark.read.parquet(bk).count() == 3)
    intercept[IllegalArgumentException] {
      Maintenance.backup(spark, dir, "20240801_000000")
    }
  }

  test("vacuum compacts files, preserves rows exactly, and leaves a backup") {
    val dir = tmpDir("graft_vac") + "/state"
    sampleState.repartition(8).write.parquet(dir)
    val before = spark.read.parquet(dir).orderBy("replay_id").collect().toSeq
    val nFilesBefore = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFilesBefore > 1)
    val bk = Maintenance.vacuum(spark, dir, "20240801_000001")
    val after = spark.read.parquet(dir).orderBy("replay_id").collect().toSeq
    assert(after == before, "vacuum must not change row content")
    val nFilesAfter = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFilesAfter == 1, s"expected 1 compacted file, found $nFilesAfter")
    assert(spark.read.parquet(bk).count() == 3, "backup must hold the pre-vacuum rows")
  }

  test("integrityReport counts duplicates and null keys") {
    val dirty = sampleState
      .unionByName(Seq(("r-1", "gen9ou", true)).toDF("replay_id", "format_id", "is_downloaded"))
      .unionByName(Seq((null.asInstanceOf[String], "gen9ou", false))
        .toDF("replay_id", "format_id", "is_downloaded"))
    val r = Maintenance.integrityReport(dirty, "replay_id").head()
    assert(r.getAs[Long]("n_rows") == 5)
    assert(r.getAs[Long]("n_distinct_keys") == 3)
    assert(r.getAs[Long]("n_null_keys") == 1)
    assert(r.getAs[Long]("n_dup_keys") == 1)
    assert(r.getAs[Long]("n_rows_in_dup_keys") == 2)
  }
}
