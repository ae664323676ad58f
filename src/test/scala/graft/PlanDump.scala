package graft

import org.apache.spark.sql.execution.ExplainMode

/** Dev probe: dump `.explain("formatted")` for a list of catalog queries to
  * files — the round-13 optimization deliverable (`plans/r13/<q>_before.txt`
  * / `_after.txt`). Runs each query through the noop sink first so the
  * captured plan is the FINAL AQE plan (isFinalPlan=true), not the initial
  * one, with the same per-query Tuning the bench applies.
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val fn = SparkEntry.queries(q)
      Tuning.withTuned(spark, q) {
        val df = fn(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"), txt)
        println(s"[plandump] wrote $q")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    spark.stop()
  }
}
