package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B probe (test scope): copurchase_link_prediction materialization
  * shapes at sf0.1, 3-pass min per variant interleaved in one session. Run:
  * sbt "Test/runMain graft.LinkPredAB [sfDir]"
  *
  * The round-12 floor decomposition blamed ~0.86 s of the row's ~1.1 s on
  * the eager adjacency checkpoint's job chain; the round-13 verdict asks
  * whether the exchange itself can serve as the materialization point.
  *
  * Variants:
  *   current — Graph.linkPrediction as shipped (eager localCheckpoint of
  *             the wedge-center adjacency)
  *   nockpt  — identical plan minus the checkpoint: the center-aggregate
  *             exchange appears once per consumer and ReuseExchange /
  *             AQE stage reuse dedupes them
  *   lazyck  — localCheckpoint(eager = false): materializes inside the
  *             first consuming job instead of a dedicated one
  */
object LinkPredAB {
  private def sortedPairs(arr: Column) = flatten(transform(arr, (a, i) =>
    transform(slice(arr, i + 2, size(arr)), b =>
      struct(a.as("u"), b.as("v")))))

  private def build(baskets: DataFrame, minSupport: Long, k: Int,
                    ckpt: String): DataFrame = {
    val edgesPre = graft.Tables.spreadHash(
        baskets.select(col("l_orderkey").as("bk"), col("l_partkey").as("it")),
        col("bk"))
      .groupBy(col("bk")).agg(sort_array(collect_set(col("it"))).as("is"))
      .select(explode(sortedPairs(col("is"))).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minSupport)
      .select("u", "v")
    val centersPre = edgesPre
      .select(explode(array(
        struct(col("v").as("c"), col("u").as("n")),
        struct(col("u").as("c"), col("v").as("n")))).as("e"))
      .groupBy(col("e.c").as("v"))
      .agg(sort_array(collect_list(col("e.n"))).as("ns"))
    val centers = ckpt match {
      case "eager" => centersPre.localCheckpoint()
      case "lazy"  => centersPre.localCheckpoint(eager = false)
      case _       => centersPre
    }
    val deg = centers.select(col("v").as("x"),
                             size(col("ns")).cast("long").as("d"))
    val edges = centers.select(explode(col("ns")).as("u"), col("v"))
      .filter(col("u") < col("v"))
    val cand = centers
      .select(explode(sortedPairs(col("ns"))).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).as("common"))
      .join(edges, Seq("u", "v"), "left_anti")
    cand
      .join(broadcast(deg.select(col("x").as("u"), col("d").as("du"))), Seq("u"))
      .join(broadcast(deg.select(col("x").as("v"), col("d").as("dv"))), Seq("v"))
      .select(col("u"), col("v"), col("common"), col("du"), col("dv"),
        round(col("common").cast("double") /
              (col("du") + col("dv") - col("common")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("common").desc, col("jaccard").desc, col("u"), col("v"))
      .limit(k)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val li = Tables.lineitem(spark, dir)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "current" -> (() => Graph.ops(li)),
      "nockpt"  -> (() => build(li, 2, 50, "none")),
      "lazyck"  -> (() => build(li, 2, 50, "lazy")))
    // hash parity first
    val ref = variants.head._2().collect().map(_.toString).toSeq
    variants.tail.foreach { case (n, f) =>
      val got = f().collect().map(_.toString).toSeq
      require(got == ref, s"$n result drift")
    }
    val times = scala.collection.mutable.Map[String, List[Double]]()
    for (_ <- 1 to 3; (n, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times(n) = dt :: times.getOrElse(n, Nil)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    times.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"[linkpredAB] $n%-8s min=${ts.min}%.3f all=${ts.reverse.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }

  private object Graph {
    def ops(li: DataFrame): DataFrame =
      graft.ops.Graph.linkPrediction(li, "l_orderkey", "l_partkey",
                                     minSupport = 2, k = 50)
  }
}
