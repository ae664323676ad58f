package graft

/** Dev probe: formatted plan of a catalog query after execution. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val q = if (args.length > 1) args(1) else "ivfpq_ann_topk"
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(q)
    Tuning.withTuned(spark, q) {
      val df = fn(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      println("[explain-start]")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(200)).take(80).mkString("\n"))
      println("[explain-end]")
    }
    spark.stop()
  }
}
