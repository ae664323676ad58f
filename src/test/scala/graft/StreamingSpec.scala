package graft

import graft.streaming.Streaming
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("ts", TimestampType),
    StructField("event_type", StringType), StructField("is_failure", BooleanType)))

  private def rows(data: Seq[(String, String, String, Boolean)]) =
    data.toDF("id", "ts_s", "event_type", "is_failure")
      .select($"id", $"ts_s".cast("timestamp").as("ts"), $"event_type", $"is_failure")

  test("watermarked tumbling daily aggregation (T1/T7)") {
    val src = tmp("stream-src")
    rows(Seq(
      ("a", "2024-01-01 01:00:00", "click", false),
      ("b", "2024-01-01 02:00:00", "error", false),
      ("c", "2024-01-02 03:00:00", "click", false)
    )).write.mode("append").parquet(src)

    val q = Streaming.dailyStats(spark, src, schema)
      .writeStream.outputMode("complete").format("memory").queryName("daily").start()
    try {
      q.processAllAvailable()
      val out = spark.sql(
          "SELECT date_format(day.start,'yyyy-MM-dd') d, n_events, n_error FROM daily")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set(("2024-01-01", 2L, 1L), ("2024-01-02", 1L, 0L)))
    } finally q.stop()
  }

  test("gap-based session windows: events within the gap merge, beyond it split") {
    val src = tmp("session-src")
    rows(Seq(
      ("u1", "2024-01-01 01:00:00", "click", false),
      ("u1", "2024-01-01 01:10:00", "click", false),  // 10 min later: same session
      ("u1", "2024-01-01 03:00:00", "click", false),  // > 30 min gap: new session
      ("u2", "2024-01-01 01:05:00", "click", false)   // other key: own session
    )).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = Streaming.sessionStats(stream, "id", "ts", "30 minutes", "1 hour")
      .writeStream.outputMode("complete").format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      val out = spark.sql(
          "SELECT id, date_format(session_start,'HH:mm') s, date_format(session_end,'HH:mm') e, n_events FROM sessions")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      // session end = last event + gap (session_window semantics)
      assert(out == Set(
        ("u1", "01:00", "01:40", 2L),
        ("u1", "03:00", "03:30", 1L),
        ("u2", "01:05", "01:35", 1L)), out)
    } finally q.stop()
  }

  test("flatMapGroupsWithState retry machine resolves and drops state (T5)") {
    implicit val s = spark
    val src = tmp("retry-src")
    // k1: fail, fail, ok → success on attempt 3; k2: three fails → give up;
    // k3: one fail, unresolved (stays in state, emits nothing)
    Seq(("k1", false), ("k1", false), ("k1", true),
        ("k2", false), ("k2", false), ("k2", false),
        ("k3", false))
      .toDF("id", "ok").write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("id STRING, ok BOOLEAN").parquet(src)
      .as[graft.streaming.FetchAttempt]
    val q = graft.streaming.Streaming.retryStateMachine(stream, maxAttempts = 3)
      .writeStream.outputMode("append").format("memory").queryName("verdicts").start()
    try {
      q.processAllAvailable()
      val out = spark.sql("SELECT id, attempts, gaveUp FROM verdicts").collect()
        .map(r => r.getString(0) -> (r.getInt(1), r.getBoolean(2))).toMap
      assert(out == Map("k1" -> ((3, false)), "k2" -> ((3, true))))
    } finally q.stop()
  }

  test("dedupStream drops duplicate keys within the watermark (U5 streaming)") {
    val src = tmp("dedup-src")
    rows(Seq(
      ("k1", "2024-01-01 01:00:00", "click", false),
      ("k1", "2024-01-01 01:10:00", "click", false),  // dup within watermark → dropped
      ("k2", "2024-01-01 01:20:00", "click", false)
    )).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = Streaming.dedupStream(stream, Seq("id"), "ts", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("deduped").start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT id FROM deduped").as[String].collect().toSeq
      assert(ids.sorted == Seq("k1", "k2"), s"got $ids")
    } finally q.stop()
  }

  test("foreachBatch merge: idempotent state + dead-letter split (T4/T5)") {
    val src = tmp("stream-src2"); val state = tmp("stream-state")
    val dead = tmp("stream-dead"); val ckpt = tmp("stream-ckpt")

    rows(Seq(("k1", "2024-01-01 01:00:00", "click", false),
             ("k2", "2024-01-01 01:00:00", "click", true)))
      .write.mode("append").parquet(src)

    val stream = spark.readStream.schema(schema).parquet(src)
    val q = Streaming.runToStateTable(spark, stream, state, dead, Seq("id"), ckpt,
      tiebreak = Seq(col("ts").desc))
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(state).select("id").as[String].collect().toSet == Set("k1"))
      assert(spark.read.parquet(dead).select("id").as[String].collect().toSet == Set("k2"))

      // second micro-batch: k1 re-delivered (update wins), k3 new
      rows(Seq(("k1", "2024-01-01 05:00:00", "purchase", false),
               ("k3", "2024-01-01 06:00:00", "click", false)))
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val st = spark.read.parquet(state)
      assert(st.select("id").as[String].collect().toSet == Set("k1", "k3"))
      assert(st.filter($"id" === "k1").select("event_type").as[String].head() == "purchase",
        "later micro-batch wins for the same key")
    } finally q.stop()
  }
}
