package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Dev probe (not a test): PQ-ADC recall vs exact top-5 across
  * (m, codes, iters) configs at one or more SFs — the measurement behind
  * pqTopK's defaults. Run:
  *   sbt "Test/runMain graft.PqProbe /root/testdata/sf0.001 /root/testdata/sf0.01"
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    for (dir <- args) {
      val emb = Tables.embeddings(spark, dir)
      val qs = emb.filter($"vec_id" < 8); val corpus = emb.filter($"vec_id" >= 8)
      val exact = Similarity.cosineTopK(qs, corpus, 5)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      for ((m, k, iters) <- Seq((16, 16, 1), (16, 16, 2), (16, 16, 3),
                                (16, 32, 2))) {
        val approx = Similarity.pqTopK(qs, corpus, 5, m, k, iters)
          .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
        val recall = (exact intersect approx).size.toDouble / exact.size
        println(f"PQPROBE $dir%s m=$m%-3d k=$k%-3d iters=$iters%d recall=$recall%.3f")
      }
    }
  }
}
