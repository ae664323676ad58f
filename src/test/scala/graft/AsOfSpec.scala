package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: latest right at-or-before each left row, null when none") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00")),
                   (2L, 10L, ts("2024-01-01 12:00:00")),
                   (3L, 20L, ts("2024-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 10:00:00"), 100L), // equal ts → visible
                    (10L, ts("2024-01-01 11:00:00"), 200L))
      .toDF("user_id", "ts", "purchase_epoch")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", Seq("purchase_epoch"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(1L).contains(100L), "same-instant right row is visible")
    assert(out(2L).contains(200L), "latest prior wins")
    assert(out(3L).isEmpty, "no prior right row → null")
  }

  test("asofJoin: NULL keys never match (ASOF equality semantics)") {
    val left = Seq((1L, Some(10L), ts("2024-01-01 12:00:00")),
                   (2L, None, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((Some(10L), ts("2024-01-01 10:00:00"), 1L),
                    (None: Option[Long], ts("2024-01-01 11:00:00"), 2L))
      .toDF("user_id", "ts", "purchase_epoch")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", Seq("purchase_epoch"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(1L).contains(1L))
    assert(out(2L).isEmpty, "NULL-key left row must not see NULL-key right rows")
  }

  test("sessionize: gap strictly greater than threshold opens a session") {
    val ev = Seq((1L, 7L, ts("2024-01-01 10:00:00")),
                 (2L, 7L, ts("2024-01-01 10:30:00")),  // gap == 1800 → same session
                 (3L, 7L, ts("2024-01-01 11:00:01")),  // gap 1801 → new session
                 (4L, 8L, ts("2024-01-01 10:00:00")))  // other user
      .toDF("event_id", "user_id", "ts")
    val out = AsOf.sessionize(ev, "user_id", "ts", col("event_id"), 1800)
      .select("event_id", "session_no").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L)
    assert(out(3L) == 2L)
    assert(out(4L) == 1L)
  }

  test("priorWindowCounts: half-open [t-w, t) boundaries, zero-count probes kept") {
    // probe at 12:00:00 with w=3600s: window is [11:00:00, 12:00:00) —
    // build rows exactly at t-w are IN, exactly at t are OUT
    val probe = Seq((1L, 7L, ts("2024-01-01 12:00:00")),
                    (2L, 7L, ts("2024-01-01 00:10:00")),   // nothing prior
                    (3L, 9L, ts("2024-01-01 12:00:00")))   // other key sees nothing
      .toDF("event_id", "user_id", "ts")
    val build = Seq((101L, 7L, ts("2024-01-01 11:00:00")), // == t-w → in
                    (102L, 7L, ts("2024-01-01 11:59:59")), // in
                    (103L, 7L, ts("2024-01-01 12:00:00")), // == t → out
                    (104L, 7L, ts("2024-01-01 10:59:59")), // before window → out
                    (105L, 8L, ts("2024-01-01 11:30:00"))) // other key → out
      .toDF("event_id", "user_id", "ts")
    val out = AsOf.priorWindowCounts(probe, build, "user_id", "ts", "event_id", 3600L)
      .select("event_id", "n_prior").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
  }

  test("priorWindowCounts: window spanning a bucket boundary is not double-counted") {
    // bucket width == w; probe lands mid-bucket so its window covers parts
    // of two buckets — each build row must count exactly once even though
    // the probe explodes into both bucket keys
    val probe = Seq((1L, 5L, ts("2024-01-01 00:30:00")))
      .toDF("event_id", "user_id", "ts")
    val build = Seq((11L, 5L, ts("2023-12-31 23:40:00")),  // previous bucket, in window
                    (12L, 5L, ts("2024-01-01 00:10:00")),  // same bucket, in window
                    (13L, 5L, ts("2023-12-31 23:20:00")))  // previous bucket, before window
      .toDF("event_id", "user_id", "ts")
    val out = AsOf.priorWindowCounts(probe, build, "user_id", "ts", "event_id", 3600L)
      .select("n_prior").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(2L))
  }
}
