package graft

import graft.ops.{Profile, Scalars}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("columnProfile: nulls on raw, distinct/min/max on canonical, one row per column") {
    val df = Seq(
      (Some(3L), "b", 19.99),
      (None, "a", 19.99),
      (Some(10L), "b", 5.00))
      .toDF("id", "s", "price")
    val out = Profile.columnProfile(df, Seq(
        ("id", col("id"), col("id")),
        ("s", col("s"), col("s")),
        ("price", col("price"), Scalars.moneyCents(col("price")))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    // typed min/max: id 3 < 10 (a lexicographic string min would say "10")
    assert(out("id") == ((3L, 1L, 2L, "3", "10")))
    assert(out("s") == ((3L, 0L, 2L, "a", "b")))
    // money canonicalized to cents before distinct/min/max
    assert(out("price") == ((3L, 0L, 2L, "500", "1999")))
    assert(out.keySet == Set("id", "s", "price"))
  }

  test("columnProfile: hash-aggregated distinct expand + sortless keyless basics") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    val plan = Profile.columnProfile(df, Seq(
        ("a", col("a"), col("a")), ("b", col("b"), col("b"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "exact multi-distinct profiles via one Expand:\n" + plan)
    // the expand side must stay a HashAggregate: string min/max buffers fused
    // in would demote it to a SortAggregate under a wide sort (measured 6.1 s
    // vs 0.9 s at sf0.1) — the keyless basics face absorbs them sort-free
    assert(plan.contains("HashAggregate"), plan)
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(sorts == 1,
      s"only the 6-row presentation sort is allowed (got $sorts): keyless " +
      "SortAggregate needs none, and the distinct face must not demote:\n" + plan)
    // the two 1-row faces combine via broadcast; never a shuffled join
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("snapshotDrift: hand-computed deltas, null-safe min/max flags") {
    val a = Seq((1L, Option("x")), (2L, None), (3L, Option("y")))
      .toDF("id", "v")
    val b = Seq((4L, Option.empty[String]), (5L, None)).toDF("id", "v")
    val r = Profile.snapshotDrift(a, b, Seq(("v", col("v"), col("v"))))
      .head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L, "rows a/b")
    assert(r.getLong(3) == 1L && r.getLong(4) == 2L, "nulls a/b")
    assert(r.getLong(5) == 2L && r.getLong(6) == 0L, "distinct a/b")
    assert(r.getDouble(7) == 0.666667, s"null-rate delta: ${r.getDouble(7)}")
    assert(r.getDouble(8) == 0.0, "distinct ratio b/a")
    assert(r.getDouble(9) == 0.666667, "row ratio 2/3")
    assert(r.getBoolean(10) && r.getBoolean(11),
      "all-null side must flag min/max changed, not NULL")
    // identical snapshots: all deltas zero, flags false
    val same = Profile.snapshotDrift(a, a, Seq(("v", col("v"), col("v")))).head()
    assert(same.getDouble(7) == 0.0 && same.getDouble(8) == 1.0
      && same.getDouble(9) == 1.0 && !same.getBoolean(10) && !same.getBoolean(11))
  }
}
