package graft

import org.apache.spark.sql.SparkSession

/** Dev A/B probe (test scope): per-query tuning variants for the sub-second
  * catalog tail at sf0.1. For each candidate query, interleaves 3 passes of
  * the variants in one session (same host window, same JIT state):
  *
  *   base  — current Tuning policy (whatever `withTuned` applies today)
  *   aqe0  — AQE off
  *   aqe0s8 — AQE off + spark.sql.shuffle.partitions=8
  *   s8    — AQE on (current policy otherwise) + shuffle.partitions=8
  *
  * Run: sbt "Test/runMain graft.TailAB q1,q2,... [sfDir]"
  * Prints per-variant min; a variant is a candidate for Tuning membership
  * only when its win is >=0.08 s AND reproduces in a second interleaved run.
  */
object TailAB {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("nation_revenue", "brand_revenue"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1000).groupBy("l_returnflag").count().collect()

    def withConf[A](pairs: (String, String)*)(body: => A): A = {
      val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    def run(name: String, confs: Seq[(String, String)]): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      withConf(confs: _*) {
        Tuning.withTuned(spark, name) {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        }
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (System.nanoTime() - t0) / 1e9
    }

    val variants: Seq[(String, Seq[(String, String)])] = Seq(
      "base"   -> Seq.empty,
      "aqe0"   -> Seq("spark.sql.adaptive.enabled" -> "false"),
      "aqe0s8" -> Seq("spark.sql.adaptive.enabled" -> "false",
                      "spark.sql.shuffle.partitions" -> "8"),
      "s8"     -> Seq("spark.sql.shuffle.partitions" -> "8"))

    for (name <- names) {
      // warm each variant once (plan cache, codegen)
      variants.foreach { case (_, c) => run(name, c) }
      // pass loop OUTER, variant loop INNER: a host stall then lands on all
      // variants of one pass instead of biasing a single variant's 3-pass min
      val times = (1 to 3).map(_ => variants.map { case (_, c) => run(name, c) })
      val mins = variants.zipWithIndex.map { case ((v, _), i) =>
        v -> times.map(_(i)).min
      }
      val base = mins.head._2
      val line = mins.map { case (v, t) =>
        f"$v=$t%.3f${if (t < base - 0.08) "*" else ""}"
      }.mkString("  ")
      println(f"[tailab] $name%-28s $line")
    }
    spark.stop()
  }
}
