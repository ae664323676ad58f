package graft

import graft.ops.{Compaction, Lifecycle}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-compact").toString

  private def batch(rows: Seq[(String, String, Long, String)]) =
    rows.toDF("replay_id", "format_id", "uploadtime", "payload")

  private val day1 = 1704067200L // 2024-01-01
  private val day2 = 1704153600L // 2024-01-02

  test("compact writes date-partitioned parquet and dedups on append (S5/U1/U5)") {
    val path = tmp()
    Compaction.compact(spark,
      batch(Seq(("r1", "f", day1, "v1"), ("r2", "f", day1, "v1"))),
      path, "replay_id", "uploadtime")
    assert(spark.read.parquet(path).count() == 2)

    // second batch: r2 re-delivered with a later uploadtime (wins), r3 new on day2
    Compaction.compact(spark,
      batch(Seq(("r2", "f", day1 + 60, "v2"), ("r3", "f", day2, "v1"))),
      path, "replay_id", "uploadtime")
    val out = spark.read.parquet(path)
    assert(out.count() == 3, "dedup by key kept one row per replay")
    val r2 = out.filter($"replay_id" === "r2").collect().head
    assert(r2.getAs[String]("payload") == "v2", "latest-by-uploadtime survives")
    // partition layout exists
    assert(new java.io.File(s"$path/format_id=f/day=2024-01-02").exists())
  }

  test("P7/S8: extension glob + directory listing select only matching files") {
    // the reference lists a replay directory and keeps '*.json'
    // (import_existing_replays.py:28-34); the Spark form is the reader's
    // pathGlobFilter — the non-matching file is never read, not read-and-dropped
    val dir = tmp()
    Files.writeString(java.nio.file.Path.of(dir, "r-1.json"), """{"replay_id":"r-1"}""")
    Files.writeString(java.nio.file.Path.of(dir, "r-2.json"), """{"replay_id":"r-2"}""")
    Files.writeString(java.nio.file.Path.of(dir, "notes.txt"), "not a replay")
    val ids = spark.read.schema("replay_id STRING")
      .option("pathGlobFilter", "*.json").json(dir)
      .select("replay_id").as[String].collect().toSet
    assert(ids == Set("r-1", "r-2"))
  }

  test("untouched partitions survive dynamic overwrite") {
    val path = tmp()
    Compaction.compact(spark, batch(Seq(("a", "f", day1, "x"))), path, "replay_id", "uploadtime")
    Compaction.compact(spark, batch(Seq(("b", "f", day2, "y"))), path, "replay_id", "uploadtime")
    val days = spark.read.parquet(path).select("day").distinct().count()
    assert(days == 2, "day1 partition not clobbered by day2-only batch")
  }

  test("crash between stage and commit point: old data intact, recover " +
       "rolls back") {
    val path = tmp()
    Compaction.compact(spark, batch(Seq(("r1", "f", day1, "old"))),
      path, "replay_id", "uploadtime")
    // stage a second batch but "die" before commitStaged — the staging dir
    // is hidden, so readers still see exactly the old data
    val (merged, hasExisting) = Compaction.mergedFor(spark,
      batch(Seq(("r1", "f", day1 + 60, "new"))),
      path, "replay_id", "uploadtime", Seq.empty)
    assert(hasExisting)
    Compaction.stage(spark, merged, path)
    val seen = spark.read.parquet(path).collect()
    assert(seen.length == 1 &&
      seen.head.getAs[String]("payload") == "old",
      "a reader mid-crash sees the old partition, whole")
    val (fwd, back) = Compaction.recover(spark, path)
    assert(fwd == 0 && back == 1, s"pre-commit leftovers roll back: $fwd/$back")
    assert(spark.read.parquet(path).count() == 1, "old data still intact")
    // staging root is clean — the next compact starts fresh
    Compaction.compact(spark, batch(Seq(("r1", "f", day1 + 60, "new"))),
      path, "replay_id", "uploadtime")
    assert(spark.read.parquet(path).collect()
      .head.getAs[String]("payload") == "new")
  }

  test("crash after the commit point: recover rolls the swap forward") {
    val path = tmp()
    Compaction.compact(spark, batch(Seq(("r1", "f", day1, "old"))),
      path, "replay_id", "uploadtime")
    val (merged, _) = Compaction.mergedFor(spark,
      batch(Seq(("r1", "f", day1 + 60, "new"), ("r2", "f", day2, "d2"))),
      path, "replay_id", "uploadtime", Seq.empty)
    val txn = Compaction.stage(spark, merged, path)
    // write the journal by hand (the commit point), then "die" before any
    // swap happens — recover must finish the job from the journal alone
    val root = new java.io.File(Compaction.stagingRoot(path))
    val rels = Seq(s"format_id=f/day=2024-01-01", s"format_id=f/day=2024-01-02")
    Files.writeString(java.nio.file.Path.of(root.getPath, s"$txn.commit"),
      rels.mkString("", "\n", "\n"))
    val (fwd, back) = Compaction.recover(spark, path)
    assert(fwd == 1 && back == 0, s"journaled txn rolls forward: $fwd/$back")
    val out = spark.read.parquet(path)
    assert(out.count() == 2, "both partitions published")
    assert(out.filter($"replay_id" === "r1").collect()
      .head.getAs[String]("payload") == "new", "swap published the new day1")
    assert(!new java.io.File(root, txn).exists() &&
           !new java.io.File(root, s"$txn.commit").exists(),
      "staging cleaned after roll-forward")
    // recover is idempotent on a clean dataset
    assert(Compaction.recover(spark, path) == ((0, 0)))
  }

  test("compact is idempotent on re-delivery (T4)") {
    val path = tmp()
    val b = batch(Seq(("a", "f", day1, "x"), ("b", "f", day1, "y")))
    Compaction.compact(spark, b, path, "replay_id", "uploadtime")
    Compaction.compact(spark, b, path, "replay_id", "uploadtime")
    assert(spark.read.parquet(path).count() == 2)
  }

  test("S3/S4: date-partitioned JSON sink + schema-pinned scan round-trips") {
    // the reference's compacted daily JSON arrays (compaction.py:149,223-225)
    // become date-partitioned JSON written once per partition; the scan reads
    // with a supplied schema (never inferred — SURVEY §1.3)
    val path = tmp()
    val docs = batch(Seq(("r1", "f", day1, "v1"), ("r2", "f", day2, "v2")))
      .withColumn("day", graft.ops.Scalars.epochToDate($"uploadtime"))
    docs.write.mode("overwrite").partitionBy("format_id", "day").json(path)
    val back = spark.read.schema(
        "replay_id STRING, uploadtime BIGINT, payload STRING, format_id STRING, day DATE")
      .json(path)
    assert(back.count() == 2)
    assert(back.filter($"day" === "2024-01-02").select("replay_id").as[String].head() == "r2",
      "partition pruning columns recovered from the path")
  }

  test("plan groups downloaded-not-compacted by format and day (A4)") {
    val status = Lifecycle.statusFromOrders(Tables.orders(spark, TestSpark.sfDir))
    val plan = Compaction.plan(status)
    assert(plan.count() > 0)
    val row = plan.orderBy($"format_id", $"day").collect().head
    assert(row.getAs[Long]("n") == row.getAs[String]("ids_csv").split(",").length)
  }
}
