package graft

import graft.ops.{Curation, Dedup, Pipeline, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.sfDir)

  test("dedupedDocs drops exactly the non-canonical dup members") {
    // plant one byte-dup pair and one near-dup pair on top of the corpus
    val planted = docs.select("doc_id", "text").unionByName(Seq(
      (100001L, "the quick brown fox jumps over the lazy dog again and again"),
      (100002L, "the quick brown fox jumps over the lazy dog again and again"),
      (100003L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (100004L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda")
    ).toDF("doc_id", "text"))
    val out = Pipeline.dedupedDocs(planted).cache()
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(100001L) && !ids.contains(100002L),
      "byte-dup keeps the lower id, drops the higher")
    assert(ids.contains(100003L) && !ids.contains(100004L),
      "near-dup cluster keeps its canonical (min) id only")
    // survivors ∪ losers = input, disjoint
    assert(out.count() + (planted.count() - out.count()) == planted.count())
    out.unpersist()
  }

  test("dedupedDocs: exact-loser pass keeps the min id of 3+-way groups " +
       "and never drops NULL-text docs") {
    // the round-13 single-pass exact-loser shape (hash → sorted id group →
    // explode past the head) must mirror the old join semantics: survivor
    // = MIN(doc_id), NULL text joins nothing → always survives
    val docs = Seq(
      (7L, "same exact bytes here"),
      (3L, "same exact bytes here"),
      (5L, "same exact bytes here"),
      (10L, null.asInstanceOf[String]),
      (11L, null.asInstanceOf[String]),
      (20L, "a lone unique document"))
      .toDF("doc_id", "text")
    val ids = Pipeline.dedupedDocs(docs).select("doc_id").as[Long]
      .collect().toSet
    assert(ids == Set(3L, 10L, 11L, 20L),
      s"min id survives, NULLs untouched: $ids")
  }

  test("curate composes the stages: manifest covers the gated train split exactly") {
    val manifest = Pipeline.curate(docs, minQuality = 0.3, lang = "en", budget = 512)
      .cache()
    // recompute the expected gated train token total independently
    val deduped = Pipeline.dedupedDocs(docs)
    val q = TextAnalysis.qualityColumns(col("text"))
    val (_, langCol) = TextAnalysis.langId(col("text"))
    val expected = deduped
      .filter(q("quality_score") >= 0.3 && langCol === "en")
      .filter(Curation.assignSplit(col("doc_id")) === "train")
      .select(sum(size(split(col("text"), " "))).as("toks"), count(lit(1)).as("n"))
      .head()
    assert(manifest.agg(sum("seq_tokens")).as[Long].head() == expected.getLong(0),
      "packing must conserve the gated train split's tokens")
    assert(manifest.agg(sum("n_docs")).as[Long].head() == expected.getLong(1),
      "every gated train doc lands in exactly one sequence")
    assert(manifest.select("split").distinct().as[String].collect().toSeq == Seq("train"))
    manifest.unpersist()
  }

  test("runTolerant: a poisoned stage dead-letters but downstream compaction still runs") {
    // reference semantics (TriggerRule.ALL_DONE): compaction consumes
    // whatever the failed stage left behind instead of being skipped
    val stages = Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
      "gate" -> (df => df.filter(length(col("text")) > 0)),
      "poisoned_enrich" -> (df => df.withColumn("x", col("no_such_column") + 1)),
      "compact" -> (df => df.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("n_chars"))))
    val res = Pipeline.runTolerant(docs, stages)
    assert(res.failed("poisoned_enrich"), "the analysis failure must be dead-lettered")
    assert(res.deadLetters.map(_._1) == Seq("poisoned_enrich"),
      "healthy stages must not dead-letter")
    // downstream ran against the last good relation: the compacted output
    // matches running gate→compact directly
    val direct = docs.filter(length(col("text")) > 0).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text"))).as("n_chars"))
    assert(res.output.collect().toSet == direct.collect().toSet)
  }

  test("scrub composes ahead of curation: masking is dedup-transparent and token-conserving") {
    import graft.ops.Scrub
    // dirty twin of the corpus slice: planted PII wrapped around the text.
    // Scrubbing must restore dedup behavior — two docs that differ only in
    // their planted PII become equal again after maskAll (each entity class
    // masks to a fixed token), so the clean-then-dedup order is what makes
    // the dedup pass see content, not contact noise.
    val dirty = Seq(
      (200001L, "the quick brown fox jumps over the lazy dog contact a@x.com"),
      (200002L, "the quick brown fox jumps over the lazy dog contact b@y.org")
    ).toDF("doc_id", "text")
    val cleaned = dirty.select(col("doc_id"), Scrub.maskAll(col("text")).as("text"))
    val groups = Dedup.exactDupGroups(cleaned).collect()
    assert(groups.length == 1 && groups.head.getAs[Long]("n") == 2L,
      "PII-only variants must collapse to one group after scrubbing")
    // and the scrubbed corpus flows through the full curation unchanged in
    // count semantics: every kept doc's tokens survive packing
    val scrubbed = docs.limit(200)
      .select(col("doc_id"), Scrub.maskAll(col("text")).as("text"),
              col("lang"), col("source"))
    val manifest = Pipeline.curate(scrubbed, minQuality = 0.0, budget = 512)
    val packedTokens = manifest.agg(sum(col("seq_tokens"))).head().getLong(0)
    assert(packedTokens > 0L, "scrubbed corpus must survive the curation flow")
  }

  test("runTolerant with no failures matches plain composition and reports no dead letters") {
    val res = Pipeline.runTolerant(docs, Seq(
      "gate" -> (df => df.filter(col("lang") === "en")),
      "count" -> (df => df.groupBy(col("source")).agg(count(lit(1)).as("n")))))
    assert(res.deadLetters.isEmpty)
    val direct = docs.filter(col("lang") === "en")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    assert(res.output.collect().toSet == direct.collect().toSet)
  }
}
