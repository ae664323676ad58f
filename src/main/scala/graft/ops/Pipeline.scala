package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end dataset-curation flow a training-data pipeline actually
  * runs, composed from the library's own operators — corpus in, packed
  * training manifest out:
  *
  *  1. exact dedup (byte-identical docs collapse to their canonical id);
  *  2. near-dup removal (n-gram Jaccard pairs → connected components →
  *     drop every member but the cluster canonical);
  *  3. quality + language gate (map-side column expressions);
  *  4. deterministic train/val/test split (hash of `doc_id`);
  *  5. sequence packing of the train split into fixed token budgets.
  *
  * Every stage is the already-spec'd operator — this object only pins the
  * composition (stage order and the exact survivor rules) so the flow a
  * user would script is itself under test. Scale shape: two shuffle-bearing
  * passes (the dedup family), everything else map-side or shard-local; the
  * cluster relation and survivor sets are bounded by the dup graph, not
  * the corpus.
  */
object Pipeline {

  /** Outcome of a tolerant stage run: the final relation plus a dead-letter
    * record per failed stage (stage name → error summary).
    */
  final case class TolerantResult(output: DataFrame,
                                  deadLetters: Seq[(String, String)]) {
    def failed(stage: String): Boolean = deadLetters.exists(_._1 == stage)
  }

  /** Run a linear chain of named stages with the reference DAG's
    * continue-past-failure semantics (`TriggerRule.ALL_DONE`,
    * showdown_replay_etl_dag.py:76-80: compaction runs even when an
    * upstream download stage fails): a stage that throws is recorded as a
    * dead letter and downstream stages run against the last good relation,
    * exactly as the reference's compaction consumes whatever the failed
    * downloader left on disk.
    *
    * Failures caught here are plan-construction/analysis failures (Spark
    * analyzes eagerly, so a stage referencing a missing column or violating
    * a precondition throws at composition time — the moment this wrapper
    * sees it). Runtime task failures surface at the caller's action, after
    * composition, by Spark's own retry/abort machinery.
    */
  def runTolerant(input: DataFrame,
                  stages: Seq[(String, DataFrame => DataFrame)]): TolerantResult =
    stages.foldLeft(TolerantResult(input, Nil)) {
      case (TolerantResult(df, dead), (name, f)) =>
        try TolerantResult(f(df), dead)
        catch {
          case scala.util.control.NonFatal(e) =>
            TolerantResult(df, dead :+
              (name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
        }
    }

  /** Survivors of exact + near-dup dedup: keep a doc unless (a) it is a
    * non-canonical member of a byte-identical group, or (b) it is a
    * non-canonical member of a near-dup cluster.
    */
  def dedupedDocs(docs: DataFrame, jaccardThreshold: Double = 0.5,
                  maxShingleDf: Int = 50): DataFrame = {
    // Exact losers in ONE corpus pass (round-13 surgery): group the
    // hashed corpus once and explode every id past the group minimum.
    // The old exactDupGroups + md5-join shape computed the corpus md5
    // TWICE (once under the groupBy, once on the join probe side) — at
    // any scale the text bytes dominate, so one (hash, id) shuffle beats
    // a second full-text scan-and-hash. NULL text is excluded exactly as
    // the old equi-join dropped it (NULL joins nothing).
    val exactLosers = docs
      .filter(col("text").isNotNull)
      .select(md5(col("text").cast("binary")).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(explode(slice(col("__ids"), lit(2), size(col("__ids")) - 1))
        .as("doc_id"))
    val nearLosers = Dedup.dupClusters(
        Dedup.ngramJaccardPairs(docs, 3, jaccardThreshold, maxShingleDf))
      .filter(col("doc_id") =!= col("canonical_id"))
      .select("doc_id")
    docs.join(exactLosers.unionByName(nearLosers).distinct(), Seq("doc_id"), "left_anti")
  }

  /** Full curation flow; returns the per-(split, shard, seq) packing
    * manifest of the quality-gated, deduplicated corpus.
    */
  def curate(docs: DataFrame, minQuality: Double = 0.3,
             lang: String = "en", budget: Int = 2048): DataFrame = {
    val deduped = dedupedDocs(docs)
    val q = TextAnalysis.qualityColumns(col("text"))
    val (_, langCol) = TextAnalysis.langId(col("text"))
    val gated = deduped
      .withColumn("quality_score", q("quality_score"))
      .withColumn("lang_id", langCol)
      .filter(col("quality_score") >= minQuality && col("lang_id") === lang)
      .drop("quality_score", "lang_id")
    val split = gated.withColumn("split", Curation.assignSplit(col("doc_id")))
    Curation.packingManifest(split.filter(col("split") === "train"), budget)
      .withColumn("split", lit("train"))
  }
}
