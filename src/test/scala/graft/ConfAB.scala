package graft

/** Dev A/B probe (test scope): run one catalog query under ad-hoc conf
  * overrides passed as k=v pairs, 3 interleaved passes, per-variant min.
  * Run: sbt "Test/runMain graft.ConfAB <query> <sfDir> conf1=v1,conf2=v2 [confA=vA,...]"
  * Variant 0 is always the bare Tuning policy (base).
  */
object ConfAB {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val variants: Seq[Seq[(String, String)]] =
      Seq.empty +: args.drop(2).toSeq.map(_.split(",").toSeq.map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v) })
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def run(confs: Seq[(String, String)]): Double = {
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val t0 = System.nanoTime()
      try Tuning.withTuned(spark, name) {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (System.nanoTime() - t0) / 1e9
    }
    variants.foreach(run) // warm
    val mins = Array.fill(variants.size)(Double.MaxValue)
    for (_ <- 1 to 3; (v, i) <- variants.zipWithIndex)
      mins(i) = math.min(mins(i), run(v))
    variants.zipWithIndex.foreach { case (v, i) =>
      val label = if (v.isEmpty) "base" else v.map { case (k, x) =>
        k.split("\\.").last + "=" + x }.mkString(",")
      println(f"[confab] $name%-32s $label%-40s ${mins(i)}%.3f")
    }
    spark.stop()
  }
}
