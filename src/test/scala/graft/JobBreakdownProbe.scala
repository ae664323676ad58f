package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev probe (test scope): per-job wall times inside one query's final
  * execution. Run: sbt "Test/runMain graft.JobBreakdownProbe [sfDir] [q...]"
  */
object JobBreakdownProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = if (args.length > 1) args.drop(1).toSeq else Seq("ivfpq_ann_topk")
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = mutable.ArrayBuffer[(Int, Long, Long, Int)]() // id, start, end, nTasks
    val starts = mutable.Map[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(), js.stageInfos.map(_.numTasks).sum)
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, n) =>
          jobs += ((je.jobId, t0, System.nanoTime(), n)) }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (q <- qs) {
      val fn = SparkEntry.queries(q)
      Tuning.withTuned(spark, q) { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      Thread.sleep(200); jobs.clear()
      Tuning.withTuned(spark, q) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        Thread.sleep(300)
        println(f"[jobs] $q build=${(t1-t0)/1e9}%.3f exec=${(t2-t1)/1e9}%.3f")
        jobs.sortBy(_._2).foreach { case (id, s, e, n) =>
          println(f"[jobs]   job$id tasks=$n wall=${(e-s)/1e9}%.3f startRel=${(s-t0)/1e9}%.3f")
        }
      }
    }
    spark.stop()
  }
}
