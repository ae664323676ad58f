package graft

import graft.ops.Lifecycle
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's secondary indexes (db.py:73-76) become write-layout
  * decisions in Spark (SURVEY §1.2/§4). Bucketing the state table and its
  * usual join inputs on the natural key makes every lifecycle join
  * co-located — at 100 TB that's the difference between a full shuffle of
  * the fact table per join and none.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed state-table join plans without a shuffle exchange") {
    val status = Lifecycle.statusFromOrders(Tables.orders(spark, TestSpark.sfDir))
    val results = status.select(col("replay_id"), (col("order_key") % 5 < 4).as("success"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at test scale the planner would broadcast (and rightly so); disable
      // it to surface the co-located sort-merge path a 100 TB join would take
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      status.write.mode("overwrite").bucketBy(8, "replay_id")
        .sortBy("replay_id").saveAsTable("status_b")
      results.write.mode("overwrite").bucketBy(8, "replay_id")
        .sortBy("replay_id").saveAsTable("results_b")

      val joined = spark.table("status_b")
        .join(spark.table("results_b"), Seq("replay_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join on the bucket key should not shuffle:\n$plan")
      assert(joined.count() == status.count())

      // control: the same join over plain parquet scans must shuffle
      val unbucketed = status.join(results, Seq("replay_id"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS status_b")
      spark.sql("DROP TABLE IF EXISTS results_b")
    }
  }
}
