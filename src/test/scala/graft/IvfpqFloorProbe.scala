package graft

/** Dev probe (test scope): decompose the worst ANN-family rows' wall time
  * into (a) driver-chain build (collects: seed/queries + Lloyd rounds),
  * (b) plan analysis+codegen of the literal-heavy final scan, (c) final
  * execution. Run: sbt "Test/runMain graft.IvfpqFloorProbe [sfDir] [q]"
  */
object IvfpqFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = if (args.length > 1) args.drop(1).toSeq
             else Seq("ivfpq_ann_topk", "ivfpq_recall", "ivf_ann_topk", "pq_recall")
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (q <- qs) {
      val fn = SparkEntry.queries(q)
      Tuning.withTuned(spark, q) {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      } // warm
      for (i <- 1 to 3) {
        Tuning.withTuned(spark, q) {
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan
          val t2 = System.nanoTime()
          df.write.mode("overwrite").format("noop").save()
          val t3 = System.nanoTime()
          println(f"[floor] $q pass$i build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f total=${(t3 - t0) / 1e9}%.3f")
        }
      }
    }
    spark.stop()
  }
}
