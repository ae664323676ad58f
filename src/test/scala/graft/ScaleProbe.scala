package graft

import org.apache.spark.sql.functions._

/** Dev probe (test scope): time the sign-LSH near-dup pairs path on a
  * scale-replica dir with fixed vs auto-sized bucket bits — the measurement
  * behind SCALE.md "Bucket-bits auto-sizing". Run:
  * sbt "Test/runMain graft.ScaleProbe <sfDir> [passes=3]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf09")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val autoBits = ops.Similarity.autoBitsPerTable(n)
    println(s"corpus n=$n autoBits=$autoBits")

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val cnt = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (dt, cnt)
      }
      println(f"$label%-18s min=${ts.map(_._1).min}%.2f s  passes=${ts.map(t => f"${t._1}%.2f").mkString(",")}  rows=${ts.head._2}")
    }
    def strongBand(df: org.apache.spark.sql.DataFrame): Long = {
      val n = df.filter(col("cos_sim") >= 0.8).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      n
    }

    time("fixed bits=8")(ops.Similarity.lshNearDupPairs(emb, 0.4))
    time(s"auto bits=$autoBits")(ops.Similarity.lshNearDupPairs(emb, 0.4, bitsPerTable = autoBits))
    println(s"strong-band (cos>=0.8) pairs: fixed=" +
      strongBand(ops.Similarity.lshNearDupPairs(emb, 0.4)) +
      s" auto=" + strongBand(ops.Similarity.lshNearDupPairs(emb, 0.4, bitsPerTable = autoBits)))
    spark.stop()
  }
}
