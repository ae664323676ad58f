package graft
import org.apache.spark.sql.functions._
object ProfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()
    def specs = Seq(
      ("o_orderkey", col("o_orderkey"), col("o_orderkey")),
      ("o_custkey", col("o_custkey"), col("o_custkey")),
      ("o_orderstatus", col("o_orderstatus"), col("o_orderstatus")),
      ("o_totalprice", col("o_totalprice"), ops.Scalars.moneyCents(col("o_totalprice"))),
      ("o_orderdate", col("o_orderdate"), to_date(col("o_orderdate"))),
      ("o_orderpriority", col("o_orderpriority"), col("o_orderpriority")))
    for (pass <- 1 to 3) {
      val t0 = System.nanoTime
      ops.Profile.columnProfile(Tables.orders(spark, dir), specs).collect()
      println(f"pass$pass ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    println(ops.Profile.columnProfile(Tables.orders(spark, dir), specs)
      .queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
