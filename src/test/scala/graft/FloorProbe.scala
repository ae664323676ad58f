package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev probe (test scope): decompose the per-execution wall time of tiny
  * catalog queries into scheduler events — jobs, stages, task time — to see
  * what the local-mode per-plan floor is made of. Run:
  * sbt "Test/runMain graft.FloorProbe <queryName> [sfDir]"
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("weighted_mixture_sample")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = mutable.ArrayBuffer[(Int, Long, Long, Int)]() // id, submit, complete, nTasks
    val jobs = mutable.ArrayBuffer[(Int, Long, Long)]()
    var taskTimeMs = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.submissionTime.getOrElse(0L),
                    si.completionTime.getOrElse(0L), si.numTasks))
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) taskTimeMs += te.taskMetrics.executorRunTime
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs += ((js.jobId, js.time, 0L))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val i = jobs.lastIndexWhere(_._1 == je.jobId)
        if (i >= 0) jobs(i) = (je.jobId, jobs(i)._2, je.time)
      }
    }
    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(); run() // warm: codegen compiled, JIT hot
    spark.sparkContext.addSparkListener(listener)
    val wall = run()
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // drain listener bus
    println(f"query=$name wall=$wall%.3f s")
    println(s"jobs=${jobs.size} stages=${stages.size} tasks=${stages.map(_._4).sum} " +
      f"taskTime=${taskTimeMs / 1000.0}%.3f s (sum executor run time)")
    val sorted = stages.sortBy(_._2)
    sorted.foreach { case (id, sub, comp, n) =>
      println(f"  stage $id%3d: ${comp - sub}%4d ms  $n%3d tasks")
    }
    if (sorted.nonEmpty) {
      val span = (sorted.map(_._3).max - sorted.map(_._2).min) / 1000.0
      val inStage = sorted.map(s => s._3 - s._2).sum / 1000.0
      println(f"stage span=$span%.3f s, in-stage=$inStage%.3f s, " +
        f"gaps(driver/planning)=${wall - span}%.3f s")
    }
    val jspan = jobs.map(j => j._3 - j._2)
    println(s"job durations ms: ${jspan.mkString(",")}")
    spark.stop()
  }
}
