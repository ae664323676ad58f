package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions.cosineSim
import graft.ops.{Dedup, Similarity}

/** Dev probe (test scope): semantic-dedup recall vs the exact pair set at
  * 1×/3×/9× corpus scale, for Lloyd iters ∈ {1, 3} and for both the fixed
  * catalog nCentroids=16 and an occupancy-held auto k (n/125 — 16 at the
  * 2 k sf0.1 corpus), quantifying the SemDeDup trade (cross-cluster misses)
  * the way `lsh_recall` does for MinHash-LSH. Two metrics per config:
  *
  *   pair recall     — |within-cluster pairs ≥ t| / |exact pairs ≥ t|
  *   removal recall  — (N − |semantic survivors|) / (N − |exact survivors|)
  *
  * Run: sbt "Test/runMain graft.SemRecallProbe" (expects /tmp/sf03 and
  * /tmp/sf09 built by tools/make_scale_replica.py; skips missing dirs).
  * Results recorded in SCALE.md "Semantic-dedup recall".
  */
object SemRecallProbe {
  def main(args: Array[String]): Unit = {
    val threshold = args.headOption.map(_.toDouble).getOrElse(0.8)
    val dirs = (if (args.length > 1) args.drop(1).toSeq.map(d => d -> d)
                else Seq("1x" -> "/root/testdata/sf0.1", "3x" -> "/tmp/sf03",
                         "9x" -> "/tmp/sf09"))
      .filter { case (_, d) => new java.io.File(s"$d/embeddings.parquet").exists() }
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for ((label, dir) <- dirs) {
      val emb = Tables.embeddings(spark, dir).localCheckpoint()
      val n = emb.count()
      val exactPairs = Similarity.nearDupPairs(emb, threshold)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        .localCheckpoint()
      val nExactPairs = exactPairs.count()
      val nExactSurv = n - Dedup.dupClusters(exactPairs)
        .filter(col("doc_id") =!= col("canonical_id")).count()
      println(f"[semrecall] $label n=$n exactPairs=$nExactPairs exactSurvivors=$nExactSurv")
      val autoK = math.max(16, (n / 125).toInt)
      val ks = if (autoK == 16) Seq(16) else Seq(16, autoK)
      for (iters <- Seq(1, 3); k <- ks) {
        val t0 = System.nanoTime()
        val assign = Similarity.ivfAssignments(emb, k, iters).localCheckpoint()
        val withEmb = assign.join(emb, Seq("vec_id"))
        val l = withEmb.select(col("cluster_id"), col("vec_id").as("vec_a"),
                               col("embedding").as("emb_a"))
        val r = withEmb.select(col("cluster_id"), col("vec_id").as("vec_b"),
                               col("embedding").as("emb_b"))
        val found = l.join(r, Seq("cluster_id"))
          .filter(col("vec_a") < col("vec_b"))
          .filter(round(cosineSim(col("emb_a"), col("emb_b")), 6) >= threshold)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
          .localCheckpoint()
        val nFound = found.count()
        val semSurv = n - Dedup.dupClusters(found)
          .filter(col("doc_id") =!= col("canonical_id")).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val pairRec = if (nExactPairs == 0) 1.0 else nFound.toDouble / nExactPairs
        val remRec = if (n == nExactSurv) 1.0
                     else (n - semSurv).toDouble / (n - nExactSurv)
        println(f"[semrecall] $label iters=$iters k=$k%-4d pairRecall=$pairRec%.4f " +
          f"removalRecall=$remRec%.4f pairs=$nFound survivors=$semSurv time=$dt%.1f s")
      }
    }
    spark.stop()
  }
}
