package graft

/** Dev probe (test scope): decompose ivf_assign's wall time into
  * (a) centroid computation (collect-side jobs), (b) plan build +
  * optimization of the literal-projection argmax, (c) execution of the
  * final noop write. Run: sbt "Test/runMain graft.IvfFloorProbe [sfDir]"
  */
object IvfFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries("ivf_assign")
    // warm
    Tuning.withTuned(spark, "ivf_assign") {
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
    for (i <- 1 to 3) {
      Tuning.withTuned(spark, "ivf_assign") {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir) // includes centroid jobs (collects)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t3 = System.nanoTime()
        println(f"[ivffloor] pass$i build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f total=${(t3 - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
