package graft

import graft.ops.Lifecycle
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val status = Lifecycle.statusFromOrders(Tables.orders(spark, TestSpark.sfDir))

  test("status derivation covers all three lifecycle branches") {
    val byState = status.groupBy("is_downloaded").count().collect()
    assert(byState.length == 2)
    assert(status.filter($"is_retry_attempted".isNull).count() > 0, "tri-state NULL present")
    assert(status.filter(col("download_details").startsWith("Failed:")).count() > 0)
  }

  test("typed Dataset face round-trips the status schema") {
    val ds = Lifecycle.typedStatus(spark, Tables.orders(spark, TestSpark.sfDir))
    val one = ds.filter(_.is_downloaded).head()
    assert(one.download_details.exists(_.startsWith("OK")))
    assert(ds.count() == status.count())
  }

  test("checkExistence defaults missing keys to false (J1)") {
    val ids = Seq("r-0", "r-1", "no-such-id").toDF("replay_id")
    val out = Lifecycle.checkExistence(ids, status).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out.size == 3)
    assert(out("no-such-id") === false)
  }

  test("semi ⊎ anti partitions the input (J2/J3)") {
    val ids = Seq("r-0", "r-5", "ghost-1", "ghost-2").toDF("replay_id")
    val semi = ids.join(status, Seq("replay_id"), "left_semi")
    val anti = Lifecycle.newRecords(ids, status, Seq("replay_id"))
    assert(semi.count() + anti.count() == ids.count())
    assert(semi.intersect(anti).count() == 0)
  }

  test("upsert is last-write-wins and idempotent (U6)") {
    val existing = Seq((1L, "old", 10L), (2L, "keep", 20L)).toDF("id", "v", "ts")
    val incoming = Seq((1L, "new", 30L), (3L, "ins", 5L)).toDF("id", "v", "ts")
    def doUpsert(a: org.apache.spark.sql.DataFrame) =
      Lifecycle.upsert(a, incoming, Seq("id"), Seq($"ts".desc, $"id"))
    val once = doUpsert(existing)
    val twice = doUpsert(once)
    val m = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "new", 2L -> "keep", 3L -> "ins"))
    assert(twice.collect().map(r => r.getLong(0) -> r.getString(1)).toMap == m)
  }

  test("dedupKeepFirst is deterministic and idempotent (A6)") {
    val df = Seq((1, 1, "a"), (1, 2, "b"), (2, 9, "c")).toDF("k", "p", "v")
    val d1 = Lifecycle.dedupKeepFirst(df, Seq("k"), Seq($"p".desc))
    assert(d1.collect().map(r => (r.getInt(0), r.getString(2))).toSet == Set((1, "b"), (2, "c")))
    assert(Lifecycle.dedupKeepFirst(d1, Seq("k"), Seq($"p".desc)).count() == d1.count())
  }

  test("dedupKeepFirstAgg matches the window form on a descending column-tuple precedence (A6)") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    val win = Lifecycle.dedupKeepFirst(li, Seq("l_orderkey"),
      Seq($"l_linenumber".desc, $"l_quantity".desc))
    val agg = Lifecycle.dedupKeepFirstAgg(li, Seq("l_orderkey"),
      Seq("l_linenumber", "l_quantity"))
    assert(win.except(agg).count() == 0 && agg.except(win).count() == 0,
      "the two A6 forms diverged")
  }

  test("retry batches are ≤ batchSize per format (T5)") {
    val batches = Lifecycle.retryBatches(status, 50)
      .groupBy("format_id", "batch_no").count().collect()
    assert(batches.nonEmpty)
    assert(batches.forall(_.getLong(2) <= 50))
  }

  test("failedNotRetried honors tri-state NULL retry flag (P4)") {
    val failed = Lifecycle.failedNotRetried(status)
    assert(failed.count() > 0)
    // every selected row is genuinely failed and not yet retried
    assert(failed.filter($"is_downloaded" ||
      coalesce($"is_retry_attempted", lit(false))).count() == 0)
  }

  test("bloomPrescreen: no false negatives, few false positives, map-side plan") {
    // incoming = every real status id (must ALL flag maybe) + synthetic
    // ids absent from status (mostly definitely-new at ~1% fpp)
    val real = status.select(col("replay_id"))
    val fake = spark.range(1000000L, 1002000L)
      .selectExpr("concat('zz-', id) AS replay_id")
    val flagged = Lifecycle.bloomPrescreen(real.unionByName(fake), status).cache()
    assert(flagged.filter(!col("maybe_existing")).join(real, Seq("replay_id"), "left_semi")
      .count() == 0, "a present id was flagged definitely-new (false negative)")
    val fakeFlagged = flagged.join(fake, Seq("replay_id"), "left_semi")
      .filter(col("maybe_existing")).count()
    assert(fakeFlagged < 100, s"false-positive rate too high: $fakeFlagged / 2000")
    // the probe itself is map-side: broadcast of the one-row sketch, no
    // shuffle join anywhere in the prescreen plan
    val p = Lifecycle.bloomPrescreen(fake, status).queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    flagged.unpersist()
  }
}
