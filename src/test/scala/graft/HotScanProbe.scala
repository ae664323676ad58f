package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Dev probe: bisect the ivfpq scan stage cost. */
object HotScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 8)
    val corpus = emb.filter(col("vec_id") >= 8)
    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val t = System.nanoTime(); val n = f
      println(f"[hot] $tag rows=$n t=${(System.nanoTime()-t)/1e9}%.3f")
    }
    time("baseline-count") { corpus.count() }
    val ivfpq = Similarity.ivfpqTopK(queries, corpus, k = 5,
      nCentroids = 16, nProbe = 4, m = 16, codesPerBook = 16, iters = 1)
    time("full-ivfpq") { ivfpq.count() }
    // piecewise: coarse assignment only
    val assign = Similarity.ivfAssignments(corpus, nCentroids = 16, iters = 1)
    time("argmax-assign") { assign.count() }
    // PQ codes only
    val books = Similarity.pqCodebooks(corpus, m = 16, k = 16, iters = 1)
    val codes = Similarity.pqEncode(corpus, books)
    time("pq-encode") { codes.count() }
    // ADC scores + explode, no filter/agg
    val adc = Similarity.pqTopK(queries, corpus, k = 5, m = 16,
      codesPerBook = 16, iters = 1)
    time("pq-topk") { adc.count() }
    spark.stop()
  }
}
