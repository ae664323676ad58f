package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B probe (test scope): copurchase_lift shapes at sf0.1, 3-pass min
  * per variant interleaved in one session. Run:
  * sbt "Test/runMain graft.BasketAB [sfDir]"
  *
  * Variants:
  *   current — distinct (okey,brand) + localCheckpoint, self-join re-shuffles
  *             both sides on okey (partitioning mismatch)
  *   keyed   — distinct, then EXPLICIT repartition on okey captured in the
  *             checkpoint (ngramJaccardPairs pattern): the self-join reads a
  *             satisfying partitioning on both sides, zero join exchanges
  *   basket  — one groupBy(okey).collect_set(brand); pairs exploded map-side
  *             from the basket array (no self-join at all)
  *   nockpt  — current shape minus the checkpoint (3 consumers recompute)
  */
object BasketAB {
  private def finish(pairs: DataFrame, counts: DataFrame,
                     totals: DataFrame): DataFrame = {
    val np = col("n_pair").cast("double")
    pairs
      .join(broadcast(counts.select(col("brand").as("brand_a"),
                                    col("n_brand").as("n_a"))), Seq("brand_a"))
      .join(broadcast(counts.select(col("brand").as("brand_b"),
                                    col("n_brand").as("n_b"))), Seq("brand_b"))
      .crossJoin(broadcast(totals))
      .select(col("brand_a"), col("brand_b"), col("n_pair"),
        col("n_a"), col("n_b"),
        round(np / col("n_orders"), 6).as("support"),
        round(np / col("n_a"), 6).as("conf_a_to_b"),
        round(np / col("n_b"), 6).as("conf_b_to_a"),
        round(np * col("n_orders")
          / (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
      .orderBy(col("brand_a"), col("brand_b"))
  }

  private def ob(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(col("l_orderkey").as("okey"), col("l_partkey"))
      .join(broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
      .select(col("okey"), col("p_brand").as("brand"))
      .distinct()

  def current(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.queries("copurchase_lift")(spark, dir)

  def keyed(spark: SparkSession, dir: String): DataFrame = {
    val sess = spark
    val prev = sess.conf.get("spark.sql.adaptive.enabled")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    val p =
      try ob(spark, dir)
        .repartition(sess.sessionState.conf.numShufflePartitions, col("okey"))
        .localCheckpoint()
      finally sess.conf.set("spark.sql.adaptive.enabled", prev)
    val totals = p.agg(countDistinct(col("okey")).as("n_orders"))
    val counts = p.groupBy(col("brand")).agg(count(lit(1)).as("n_brand"))
    val pairs = p.select(col("okey"), col("brand").as("brand_a"))
      .join(p.select(col("okey"), col("brand").as("brand_b")), Seq("okey"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy(col("brand_a"), col("brand_b")).agg(count(lit(1)).as("n_pair"))
    finish(pairs, counts, totals)
  }

  def basket(spark: SparkSession, dir: String): DataFrame = {
    val baskets = ob(spark, dir)
      .groupBy(col("okey")).agg(sort_array(collect_set(col("brand"))).as("bs"))
      .localCheckpoint()
    val totals = baskets.agg(count(lit(1)).as("n_orders"))
    val counts = baskets.select(explode(col("bs")).as("brand"))
      .groupBy(col("brand")).agg(count(lit(1)).as("n_brand"))
    // map-side i<j pair explode from the sorted basket array
    val pairExpr = flatten(transform(col("bs"), (a, i) =>
      transform(slice(col("bs"), i + 2, size(col("bs"))), b =>
        struct(a.as("brand_a"), b.as("brand_b")))))
    val pairs = baskets.select(explode(pairExpr).as("p"))
      .select(col("p.brand_a"), col("p.brand_b"))
      .groupBy(col("brand_a"), col("brand_b")).agg(count(lit(1)).as("n_pair"))
    finish(pairs, counts, totals)
  }

  /** basket shape minus the upstream distinct: collect_set itself dedups
    * within the order, so the whole query is ONE corpus shuffle (the
    * groupBy(okey) aggregate with map-side partial sets).
    */
  def basket2(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey"))
      .join(broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
      .select(col("okey"), col("p_brand").as("brand"))
    val baskets = raw
      .groupBy(col("okey")).agg(sort_array(collect_set(col("brand"))).as("bs"))
      .localCheckpoint()
    val totals = baskets.agg(count(lit(1)).as("n_orders"))
    val counts = baskets.select(explode(col("bs")).as("brand"))
      .groupBy(col("brand")).agg(count(lit(1)).as("n_brand"))
    val pairExpr = flatten(transform(col("bs"), (a, i) =>
      transform(slice(col("bs"), i + 2, size(col("bs"))), b =>
        struct(a.as("brand_a"), b.as("brand_b")))))
    val pairs = baskets.select(explode(pairExpr).as("p"))
      .select(col("p.brand_a"), col("p.brand_b"))
      .groupBy(col("brand_a"), col("brand_b")).agg(count(lit(1)).as("n_pair"))
    finish(pairs, counts, totals)
  }

  def nockpt(spark: SparkSession, dir: String): DataFrame = {
    val p = ob(spark, dir)
    val totals = p.agg(countDistinct(col("okey")).as("n_orders"))
    val counts = p.groupBy(col("brand")).agg(count(lit(1)).as("n_brand"))
    val pairs = p.select(col("okey"), col("brand").as("brand_a"))
      .join(p.select(col("okey"), col("brand").as("brand_b")), Seq("okey"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy(col("brand_a"), col("brand_b")).agg(count(lit(1)).as("n_pair"))
    finish(pairs, counts, totals)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants = Seq(
      "current" -> (() => current(spark, sfDir)),
      "keyed" -> (() => keyed(spark, sfDir)),
      "basket" -> (() => basket(spark, sfDir)),
      "basket2" -> (() => basket2(spark, sfDir)),
      "nockpt" -> (() => nockpt(spark, sfDir)))
    variants.foreach { case (_, f) => time(f()) } // warm
    val times = (1 to 3).map(_ => variants.map { case (n, f) => n -> time(f()) })
    variants.map(_._1).foreach { n =>
      val ts = times.map(_.toMap.apply(n))
      println(f"[basketab] $n%-8s min=${ts.min}%.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val ref = current(spark, sfDir).collect().map(_.toSeq).toSeq
    for ((n, f) <- variants.drop(1)) {
      val got = f().collect().map(_.toSeq).toSeq
      println(s"[basketab] $n rows equal: ${got == ref} (${ref.size} rows)")
    }
    spark.stop()
  }
}
