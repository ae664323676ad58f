package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Scalars

/** Dev A/B probe (test scope): nation_revenue shapes at sf0.1, 3-pass min
  * per variant interleaved in one session so both sides see the same host
  * window. Run: sbt "Test/runMain graft.NationAB [sfDir]"
  */
object NationAB {
  def preAgg(spark: SparkSession, dir: String): DataFrame = {
    SparkEntry.queries("nation_revenue")(spark, dir)
  }

  def direct(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir); val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir); val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.select(col("l_orderkey"),
        Scalars.discountedCents(col("l_extendedprice"), col("l_discount")).as("cents"))
      .join(o.select(col("o_orderkey"), col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
      .join(c.select(col("c_custkey"), col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg((sum(col("cents")).cast("double") / lit(10000.0)).as("revenue"),
           countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  def spreadVariant(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir); val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir); val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val orderRev = Tables.spread(
        li.select(col("l_orderkey"),
          Scalars.discountedCents(col("l_extendedprice"), col("l_discount")).as("cents")),
        col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("cents")).as("order_rev"))
    val custRev = orderRev.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("order_rev")).as("cust_rev"), count(lit(1)).as("cust_orders"))
    custRev.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg((sum(col("cust_rev")).cast("double") / lit(10000.0)).as("revenue"),
           sum(col("cust_orders")).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm all three (the AQE-off variant from the SCALE.md table is
    // measured by graft.TailAB, which owns per-conf interleaving)
    time(preAgg(spark, sfDir)); time(direct(spark, sfDir))
    time(spreadVariant(spark, sfDir))
    val (as, bs, cs) = (1 to 3).map { _ =>
      (time(preAgg(spark, sfDir)), time(direct(spark, sfDir)),
       time(spreadVariant(spark, sfDir)))
    }.unzip3
    println(f"preAgg   min=${as.min}%.3f  all=${as.map(t => f"$t%.3f").mkString(",")}")
    println(f"direct   min=${bs.min}%.3f  all=${bs.map(t => f"$t%.3f").mkString(",")}")
    println(f"spread   min=${cs.min}%.3f  all=${cs.map(t => f"$t%.3f").mkString(",")}")
    // sanity: same result
    val x = preAgg(spark, sfDir).collect().map(_.toSeq).toSeq
    val y = spreadVariant(spark, sfDir).collect().map(_.toSeq).toSeq
    println(s"rows equal: ${x == y}  (${x.size} rows)")
    println(preAgg(spark, sfDir).queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
