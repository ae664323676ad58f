package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev probe: stage wall vs task run time — is the cost in tasks or driver? */
object StageTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val q = if (args.length > 1) args(1) else "ivfpq_ann_topk"
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.get - si.submissionTime.get) / 1e3
        val run = si.taskMetrics.executorRunTime / 1e3
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val deser = si.taskMetrics.executorDeserializeTime / 1e3
        lines += f"[stage] ${si.stageId} tasks=${si.numTasks} wall=$wall%.3f run=$run%.3f cpu=$cpu%.3f deser=$deser%.3f name=${si.name.take(60)}"
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(q)
    Tuning.withTuned(spark, q) { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
    Thread.sleep(300); lines.clear()
    Tuning.withTuned(spark, q) {
      val df = fn(spark, sfDir)
      val t = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[stage] EXEC total=${(System.nanoTime()-t)/1e9}%.3f")
    }
    Thread.sleep(300)
    lines.foreach(println)
    spark.stop()
  }
}
