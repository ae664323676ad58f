package graft.ops

import org.apache.spark.sql.graft.VectorExpressions.cosineSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): brute-force
  * cosine top-k as the exact baseline, and a sign-random-projection LSH
  * variant as the scale path.
  *
  * Scale design (100 TB): the query set is always the broadcast side — the
  * corpus streams map-side; cosine is a codegen'd native expression
  * ([[graft.functions.CosineSimilarity]]); top-k per query is a ranking
  * window over (query, candidate-bucket) partitions. The LSH variant prunes
  * the corpus to matching sign-buckets before scoring, turning an O(N·Q)
  * scan into O(N + collisions).
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes for sign-LSH: component i of
    * plane p is `sin(p * 7919 + i * 104729)` — fixed, seedless, reproducible
    * across runs and engines.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(p => (0 until dim).map(i => math.sin(p * 7919.0 + i * 104729.0)))

  /** Sign-bucket id: bit p set iff dot(embedding, plane_p) > 0. */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val dot = aggregate(
        zip_with(emb, typedLit(plane), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1L) * lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors by (rounded cosine desc, vec_id asc) — rounding pins the
    * rank order across engines. Queries are broadcast; corpus streams.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val scored = corpus.select(col("vec_id"), col("embedding")).crossJoin(q)
      .select(col("q_id"), col("vec_id"),
              round(cosineSim(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** Exact cosine near-dup pairs above a threshold (vec_a < vec_b). The
    * brute-force O(N²) form — correct baseline; use [[annTopK]]'s bucketing
    * for the 100 TB path.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
              round(cosineSim(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Approximate NN via multi-table sign-LSH: `nTables` independent hash
    * tables of `bitsPerTable` sign bits each; a corpus vector is a candidate
    * when it collides with the query in *any* table (union-of-tables is the
    * standard recall amplifier — one wide table recalls almost nothing on
    * near-uniform embeddings). Equi-join on (table, bucket) replaces the
    * cross join; candidates are deduped before scoring so each pair pays the
    * cosine once. This is the IVF/LSH 100 TB path.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nTables: Int = 8, bitsPerTable: Int = 4, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nTables * bitsPerTable, dim)
    def buckets(emb: Column): Column = array(
      (0 until nTables).map { t =>
        lshBucket(emb, planes.slice(t * bitsPerTable, (t + 1) * bitsPerTable))
      }: _*)
    val qb = broadcast(queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
              posexplode(buckets(col("embedding"))).as(Seq("t", "bucket"))))
    val cands = corpus
      .select(col("vec_id"), col("embedding"),
              posexplode(buckets(col("embedding"))).as(Seq("t", "bucket")))
      .join(qb, Seq("t", "bucket"))
      .select(col("q_id"), col("q_emb"), col("vec_id"), col("embedding"))
      .dropDuplicates("q_id", "vec_id")
    val scored = cands.select(col("q_id"), col("vec_id"),
        round(cosineSim(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }
}
