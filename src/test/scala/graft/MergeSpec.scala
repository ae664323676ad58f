package graft

import graft.ops.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def state = Seq(
    ("r1", false, "pending", 10L),
    ("r2", true, "done", 20L)
  ).toDF("replay_id", "is_downloaded", "details", "ts")

  test("matched-update + not-matched-insert in one pass") {
    val batch = Seq(("r1", "ok-batch-7", 30L), ("r9", "new", 5L))
      .toDF("replay_id", "result", "ts")
    val out = Merge.into(state).using(batch).on("replay_id")
      .whenMatchedUpdate(
        "is_downloaded" -> lit(true),
        "details" -> col("src_result"))
      .whenNotMatchedInsert()
      .run()
      .collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out("r1") == ((Some(true), Some("ok-batch-7"))), "matched row updated")
    assert(out("r2") == ((Some(true), Some("done"))), "untouched row preserved")
    assert(out("r9")._1.isEmpty, "inserted row: absent source columns are null")
  }

  test("duplicate source keys reduce by the update order (idempotent LWW)") {
    val batch = Seq(("r1", "older", 100L), ("r1", "newest", 200L))
      .toDF("replay_id", "result", "ts")
    def merge() = Merge.into(state).using(batch).on("replay_id")
      .whenMatchedUpdate("details" -> col("src_result"))
      .orderUpdatesBy(col("ts").desc)
      .run()
    val d1 = merge().filter($"replay_id" === "r1").select("details").as[String].head()
    assert(d1 == "newest")
    assert(merge().collect().toSet == merge().collect().toSet, "deterministic")
  }

  test("duplicate source keys without an update order fail fast") {
    val batch = Seq(("r1", "a", 1L), ("r1", "b", 2L)).toDF("replay_id", "result", "ts")
    intercept[IllegalArgumentException] {
      Merge.into(state).using(batch).on("replay_id")
        .whenMatchedUpdate("details" -> col("src_result"))
        .run()
    }
  }

  test("update-only merge never changes cardinality") {
    val batch = Seq(("r1", "x", 1L), ("zz", "y", 2L)).toDF("replay_id", "result", "ts")
    val out = Merge.into(state).using(batch).on("replay_id")
      .whenMatchedUpdate("details" -> col("src_result"))
      .run()
    assert(out.count() == state.count())
  }
}
