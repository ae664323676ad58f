package graft

/** Dev probe: same DataFrame executed twice — is the second exec cheap? */
object RepeatExecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val q = if (args.length > 1) args(1) else "ivfpq_ann_topk"
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(q)
    Tuning.withTuned(spark, q) { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
    Tuning.withTuned(spark, q) {
      val df = fn(spark, sfDir)
      for (i <- 1 to 3) {
        val t = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"[rep] $q exec$i=${(System.nanoTime()-t)/1e9}%.3f")
      }
      // and a freshly-built plan for comparison
      val df2 = fn(spark, sfDir)
      val t = System.nanoTime()
      df2.write.mode("overwrite").format("noop").save()
      println(f"[rep] $q freshExec=${(System.nanoTime()-t)/1e9}%.3f")
    }
    spark.stop()
  }
}
