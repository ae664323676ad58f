package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles: n-grams with short-document fallback") {
    val df = Seq((1L, "a b c d e"), (2L, "a b")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c", "b c d", "c d e"))
    assert(out(2L) == Seq("a b"), "short doc falls back to whole text")
  }

  test("WordShingles expression matches the builtin-HOF reference form on the corpus") {
    val docs = Tables.documents(spark, TestSpark.sfDir).limit(200)
      .select("doc_id", "text")
      .unionByName(Seq((-1L, "a  b c"), (-2L, "solo"), (-3L, ""), (-4L, "x y x y x y"))
        .toDF("doc_id", "text"))
    val hof = TextAnalysis.shinglesOfTokens(split(col("text"), " "), col("text"), 3)
    val cmp = docs.select(
      TextAnalysis.shingles(col("text"), 3).as("fast"),
      hof.as("ref"),
      org.apache.spark.sql.graft.TextExpressions.wordShingles(col("text"), 3, distinct = true)
        .as("fastd"),
      array_distinct(hof).as("refd"))
    cmp.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), "bag form diverged from HOF reference")
      assert(r.getSeq[String](2) == r.getSeq[String](3), "distinct form diverged from HOF reference")
    }
  }

  test("quality score stays in [0,1] over the corpus") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val q = TextAnalysis.qualityColumns(col("text"))
    val bad = docs.select(q("quality_score").as("s"))
      .filter($"s" < 0 || $"s" > 1).count()
    assert(bad == 0)
  }

  test("token counts: whitespace vs BPE-ish segmentation") {
    val df = Seq((1L, "hello world")).toDF("doc_id", "text")
    val (ws, bpe) = TextAnalysis.tokenCounts(col("text"))
    val r = df.select(ws.as("ws"), bpe.as("bpe")).head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 2)
  }

  test("langId flags stopword-rich text as en") {
    val df = Seq((1L, "the cat sat on the mat with a hat"),
                 (2L, "zzz qqq www rrr ttt yyy uuu")).toDF("doc_id", "text")
    val (_, predicted) = TextAnalysis.langId(col("text"))
    val out = df.select(col("doc_id"), predicted.as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "und")
  }

  test("repetitionScores: exact fractions on a hand-computed doc") {
    // "a b a b a": 5 tokens, 2 distinct → dup_token_frac = 3/5
    // bigrams: [a b, b a, a b, b a] → 4 total, 2 distinct → dup = 1/2;
    // top bigram "a b" appears 2/4 → 1/2
    val df = Seq((1L, "a b a b a"), (2L, "x y z w")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionScores(df).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_tokens") == 5L)
    assert(r(0).getAs[Double]("dup_token_frac") == 1.0 - 2.0 / 5)
    assert(r(0).getAs[Double]("dup_2gram_frac") == 0.5)
    assert(r(0).getAs[Double]("top_2gram_frac") == 0.5)
    // fully distinct doc: all zeros except top share 1/3
    assert(r(1).getAs[Double]("dup_token_frac") == 0.0)
    assert(r(1).getAs[Double]("dup_2gram_frac") == 0.0)
    assert(r(1).getAs[Double]("top_2gram_frac") == 1.0 / 3)
  }

  test("tokenEntropy: hand-computed micro-nat values, zero for degenerate docs") {
    val df = Seq(
      (1L, "a a b b"),       // two types at p=1/2 → 2·round(0.5·ln2·1e6)
      (2L, "a b c d"),       // uniform over 4 → 4·round(0.25·ln4·1e6)
      (3L, "x"),             // single token → 0
      (4L, "a a a a a")      // single type → 0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tokenEntropy(df).orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    val half = math.round(0.5 * math.log(2.0) * 1e6)       // 346574
    val quarter = math.round(0.25 * math.log(4.0) * 1e6)
    assert(r(1L) == ((4L, 2L, 2 * half)))
    assert(r(2L) == ((4L, 4L, 4 * quarter)))
    assert(r(3L) == ((1L, 1L, 0L)))
    assert(r(4L) == ((5L, 1L, 0L)))
    // more types at equal mass ⇒ strictly higher entropy
    assert(r(2L)._3 > r(1L)._3)
  }

  test("unigramNll: hand-computed NLLs, OOV floor, vocab cutoff pinned") {
    val df = Seq(
      (1L, "a a a b"),       // in-vocab mix
      (2L, "a z"),           // 'z' is OOV at vocabSize=2
      (3L, "b b")
    ).toDF("doc_id", "text")
    // corpus: a×4, b×3, z×1, N=8; top-2 vocab = {a, b}; z OOV → floor 1/N
    val r = TextAnalysis.unigramNll(df, vocabSize = 2).orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    def u(c: Long) = math.round(math.log(8.0 / c) * 1e6)
    assert(r(1L) == ((4L, 0L, 3 * u(4) + u(3))))
    assert(r(2L) == ((2L, 1L, u(4) + u(1))), "OOV token scores at the 1/N floor")
    assert(r(3L) == ((2L, 0L, 2 * u(3))))
    // mean = exact integer division surfaced as double
    val m = TextAnalysis.unigramNll(df, vocabSize = 2)
      .filter(col("doc_id") === 2L).select("mean_nll_unats").head().getDouble(0)
    assert(m == (u(4) + u(1)).toDouble / 2)
    // cutoff tie-break: b and c tie at count 2 → token asc keeps 'b'
    val tie = Seq((1L, "a a b b c c")).toDF("doc_id", "text")
    val rt = TextAnalysis.unigramNll(tie, vocabSize = 2).head()
    assert(rt.getLong(2) == 2L, "the 2 'c' tokens fall OOV, 'b' stays in-vocab")
  }

  test("bpeMergeCandidates: frequency order with pinned boundary tie-break") {
    val df = Seq(
      (1L, "a b a b a b"),   // 'a b' ×3, 'b a' ×2
      (2L, "c d c d"),       // 'c d' ×2, 'd c' ×1
      (3L, "z z z")          // 'z z' ×2
    ).toDF("doc_id", "text")
    val top = TextAnalysis.bpeMergeCandidates(df, 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top(0) == (("a b", 3L)))
    // three pairs tie at n=2 → lexicographic pair order breaks the tie and
    // the k-boundary cut is deterministic
    assert(top.slice(1, 3).toSeq == Seq(("b a", 2L), ("c d", 2L)))
  }

  test("nbClassifierScores: separates the reference class, hand-checked weight") {
    // ref class 'en' shares token 'the'; bg shares 'der'; 'x' is common to
    // both (≈0 weight), 'q' is OOV at vocab cutoff time in the big corpus
    val df = Seq(
      (1L, "en", "the the x"), (2L, "en", "the x x"),
      (3L, "de", "der der x"), (4L, "de", "der x x")
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.nbClassifierScores(df, refLang = "en", vocabSize = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    // en docs must score above de docs (positive vs negative log-odds)
    assert(out(1L)._2 > out(3L)._2 && out(2L)._2 > out(4L)._2,
      s"reference-class docs must outscore background: $out")
    // hand-check the 'the' weight: cr=3, cb=0, nRef=6, nBg=6, V=3
    //   w = round(ln((6+3)/(0+1))·1e6) − round(ln((6+3)/(3+1))·1e6)
    val expected = math.round(math.log(9.0 / 1.0) * 1e6) -
      math.round(math.log(9.0 / 4.0) * 1e6)
    // doc 1 = the(w) + the(w) + x(wx); doc 2 = the(w) + 2·x(wx); subtract
    // to isolate w: (doc1 − doc2) = w − wx, and wx is symmetric-zero here
    // (cr = cb for 'x') — so doc1 − doc2 = w exactly
    assert(out(1L)._2 - out(2L)._2 == expected,
      s"hand-computed 'the' weight mismatch: ${out(1L)._2 - out(2L)._2} vs $expected")
  }

  test("nbClassifierScores on the corpus: en mean outscores non-en mean") {
    val scored = TextAnalysis.nbClassifierScores(
      Tables.documents(spark, TestSpark.sfDir))
    val means = scored.groupBy(expr("lang = 'en'").as("isEn"))
      .agg(avg(col("mean_logodds_unats")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"en mean ${means(true)} must exceed non-en mean ${means(false)}")
  }

  test("reliabilityBins: bins partition the docs, confidence is monotone " +
       "in the score bins, rates and gap stay in [0,1]") {
    val scored = TextAnalysis.nbClassifierScores(
      Tables.documents(spark, TestSpark.sfDir))
    val out = TextAnalysis.reliabilityBins(scored, refLang = "en", bins = 4)
      .collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(out.map(_.getLong(1)).sum == scored.count(),
      "bins must partition the scored docs")
    // sigmoid is monotone in the score, bins are score-ordered → the mean
    // confidence must be non-decreasing across bins
    val confs = out.map(_.getDouble(5))
    assert(confs.zip(confs.tail).forall { case (a, b) => a <= b },
      s"mean_conf not monotone across bins: ${confs.mkString(", ")}")
    for (r <- out) {
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
    }
    // the top score bin should be en-richer than the bottom one (the NB
    // score separates the classes — same property the scorer test pins)
    assert(out.last.getDouble(4) > out.head.getDouble(4),
      "top-quartile en rate must exceed bottom-quartile en rate")
  }

  test("reliabilityBins: empty input yields a 0-row schema-correct report, " +
       "not an exception") {
    val scored = TextAnalysis.nbClassifierScores(
      Tables.documents(spark, TestSpark.sfDir)).filter(lit(false))
    val out = TextAnalysis.reliabilityBins(scored, refLang = "en", bins = 4)
    assert(out.columns.toSeq == Seq("bin", "n_docs", "n_ref",
      "conf_micro_sum", "ref_rate", "mean_conf", "calib_gap"))
    assert(out.count() == 0L)
  }

  test("reliabilityBins: constant scores collapse to one bin that still " +
       "partitions the docs") {
    // all scores equal → every quantile cut identical → a single bin; the
    // report must stay a partition of the docs (the collapse is logged)
    val scored = Seq((1L, "en", 4L, 0L), (2L, "de", 4L, 0L), (3L, "en", 4L, 0L))
      .toDF("doc_id", "lang", "n_tokens", "logodds_unats")
      .withColumn("mean_logodds_unats", lit(0.0))
    val out = TextAnalysis.reliabilityBins(scored, refLang = "en", bins = 4)
      .collect()
    assert(out.map(_.getLong(1)).sum == 3L, "bins must still partition docs")
    assert(out.length == 1, s"equal cuts collapse to one bin: ${out.length}")
  }

  test("bm25TopK: hand-computed scores, non-matching docs absent") {
    val df = Seq((1L, "x x y"), (2L, "x z"), (3L, "z z z")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(df, Seq("x"), k = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L), "doc without query terms must not score")
    // N=3, df(x)=2, idf=ln(1.6); avgdl=8/3
    val idfMicro = math.round(math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0) * 1e6)
    def factor(tf: Double, len: Long) =
      tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * len / (8.0 / 3)))
    assert(out(1L).getLong(2) == math.round(idfMicro * factor(2, 3)))
    assert(out(2L).getLong(2) == math.round(idfMicro * factor(1, 2)))
    assert(out(1L).getLong(2) > out(2L).getLong(2), "tf 2 in len 3 outranks tf 1")
  }

  test("bm25TopK: empty corpus yields a 0-row schema-correct top-k, " +
       "not an exception") {
    val df = Seq((1L, "x")).toDF("doc_id", "text").filter(lit(false))
    val out = TextAnalysis.bm25TopK(df, Seq("x"), k = 10)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_terms_matched", "score_micro", "bm25"))
    assert(out.count() == 0L)
  }

  test("readability: hand-computed Flesch on a punctuated sentence") {
    val df = Seq((1L, "the cat sat."), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.readability(df).collect().map(r => r.getLong(0) -> r).toMap
    val r = out(1L)
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L && r.getLong(3) == 3L)
    val fre = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    val fk = 0.39 * 3.0 + 11.8 * 1.0 - 15.59
    assert(r.getDouble(4) == math.rint(fre * 1e6) / 1e6 ||
           math.abs(r.getDouble(4) - fre) < 1e-6, s"fre: ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - fk) < 1e-6, s"fk: ${r.getDouble(5)}")
    // empty text tokenizes to one empty token in the corpus convention —
    // whichever way, a 0-vowel doc must not divide by zero
    assert(!out.contains(2L) || !out(2L).isNullAt(4))
  }

  test("sourceTokenStats: hand-computed counts and interpolated percentiles") {
    val df = Seq((1L, "a", "s1"), (2L, "a b", "s1"), (3L, "a b c", "s1"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceTokenStats(df).head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 6L && r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 2.0, "p50 of [1,2,3]")
    assert(r.getDouble(5) == 2.8, s"p90 interpolates 2 + 0.8: ${r.getDouble(5)}")
  }

  test("sourceMixEntropy: monolingual source at zero, uniform pair at ln 2") {
    val df = Seq((1L, "s1", "en"), (2L, "s1", "en"),
                 (3L, "s2", "en"), (4L, "s2", "de"))
      .toDF("doc_id", "source", "lang")
    val out = TextAnalysis.sourceMixEntropy(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("s1").getLong(3) == 0L, "monolingual source has zero entropy")
    val ln2Micro = 2 * math.round(0.5 * math.log(2.0) * 1e6)
    assert(out("s2").getLong(3) == ln2Micro, s"uniform pair: ${out("s2").getLong(3)}")
    assert(out("s2").getLong(1) == 2L && out("s2").getLong(2) == 2L)
  }

  test("langIdConfusion: cells partition the corpus, shares are per-lang exact") {
    val df = Seq((1L, "the a of and", "en"), (2L, "x y z w q", "de"),
                 (3L, "the cat", "de")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langIdConfusion(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(("en", "en")) == ((1L, 1.0)), "stopword-rich en doc predicted en")
    assert(out(("de", "und")) == ((1L, 0.5)), "stopword-free doc predicted und")
    assert(out(("de", "en")) == ((1L, 0.5)), "'the cat' crosses the 4% threshold")
    assert(out.values.map(_._1).sum == 3L, "cells partition the corpus")
  }

  test("bigramNll: hand-computed interpolated NLL, short docs excluded") {
    // corpus: doc 1 "a b a b", doc 2 "a b", doc 3 "x" (no bigrams)
    // bigrams: "a b" ×3, "b a" ×1 → p(b|a)=3/3=1... wait cf('a')=3, cf('b')=1
    // unigrams over ALL docs: a×3, b×3, x×1, N=7
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNll(df, lambda = 0.75).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!out.contains(3L), "single-token doc has no bigram positions")
    def nll(n2: Long, na: Long, n1: Long): Long =
      math.round(math.log(1.0 / (0.75 * (n2.toDouble / na)
        + 0.25 * (n1.toDouble / 7.0))) * 1e6)
    val ab = nll(3, 3, 3) // p(b|a) = 3/3, p1(b) = 3/7
    // conditional denominator semantics pinned: cf(x) = bigrams STARTING
    // with x, so cf('b') = 1 (the one 'b a'), NOT unigram count 3
    val ba = nll(1, 1, 3)
    assert(out(2L) == ((1L, ab)), s"doc 2 = one 'a b' position: ${out(2L)} vs $ab")
    assert(out(1L) == ((3L, 2 * ab + ba)),
      s"doc 1 = two 'a b' + one 'b a': ${out(1L)} vs ${(3L, 2 * ab + ba)}")
  }

  test("collocationPmi: hand-computed value, perfect pair beats independent pair") {
    // corpus: 'x y' always together (5 docs), 'p'/'q' independent fillers
    val df = (1L to 5L).map(i => (i, "x y p q")).toDF("doc_id", "text")
    val out = TextAnalysis.collocationPmi(df, minCount = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // N = 20 tokens, P = 15 bigram positions; c(x y)=5, c(x)=c(y)=5
    def pmi(cab: Long, ca: Long, cb: Long): Long =
      math.round(math.log(cab.toDouble * 20 * 20) * 1e6) -
        math.round(math.log(15.0 * ca * cb) * 1e6)
    assert(out(("x", "y")) == ((5L, pmi(5, 5, 5))), s"got ${out(("x", "y"))}")
    assert(out(("y", "p")) == ((5L, pmi(5, 5, 5))))
    // the always-adjacent pair scores above chance: ln(5*400/(15*25)) > 0
    assert(out(("x", "y"))._2 > 0)
    // pairs under minCount are pruned
    assert(!out.contains(("q", "x")), "cross-doc pair q->x never occurs")
  }

  test("fingerprint min/max are stable hex strings") {
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val f = TextAnalysis.fingerprint(col("text"))
    val r = df.select(f("n_shingles").as("n"), f("fp_min").as("lo"), f("fp_max").as("hi")).head()
    assert(r.getInt(0) == 4)
    assert(r.getString(1) <= r.getString(2))
    assert(r.getString(1).matches("[0-9a-f]{32}"))
  }

  test("vocabGrowthCurve: exact counts on a constructed corpus; curve is monotone") {
    // doc 10: a b; doc 20: a c; doc 30: a b c d — vocab at thresholds
    val df = Seq((10L, "a b"), (20L, "a c"), (30L, "a b c d"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.vocabGrowthCurve(df, deciles = 3).collect()
    // thresholds: (1·30)div3=10, 20, 30
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 10L, 2L, 2L), (2L, 20L, 4L, 3L), (3L, 30L, 8L, 4L)))
    // type/token ratio falls as the corpus repeats itself
    assert(rows.map(_.getDouble(4)).sliding(2).forall(p => p(1) <= p(0)))
  }

  test("vocabGrowthCurve: driver-assembled long-id path is bit-identical " +
       "to the relational shape") {
    // int ids route through the original inner-join shape (the long-id
    // guard declines); the same ids as longs take the round-13
    // driver-chained path — rows must agree bit-for-bit, including the
    // NULL-text doc (drops from both counters) and the empty leading
    // decile (threshold below every id → no row in either shape)
    val rowsRaw = Seq((100, "a b"), (200, "a c"), (300, "a b c d"),
                      (400, null.asInstanceOf[String]), (500, "e e e"))
    val asLong = rowsRaw.map { case (i, t) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val asInt = rowsRaw.toDF("doc_id", "text")
    for (d <- Seq(1, 3, 7, 10)) {
      val fast = TextAnalysis.vocabGrowthCurve(asLong, d)
        .collect().sortBy(_.getLong(0)).toSeq
      val slow = TextAnalysis.vocabGrowthCurve(asInt, d)
        .collect().sortBy(_.getLong(0)).toSeq
      assert(fast == slow, s"deciles=$d fast=$fast slow=$slow")
    }
    // empty corpus: 0-row schema-correct report from both shapes
    assert(TextAnalysis.vocabGrowthCurve(asLong.filter(lit(false)))
      .collect().isEmpty)
    assert(TextAnalysis.vocabGrowthCurve(asInt.filter(lit(false)))
      .collect().isEmpty)
  }

  test("ngramNoveltyScores: first owner gets the credit, verbatim repeats score zero") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),  // verbatim repeat → 0 novelty
      (3L, "a completely different text here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramNoveltyScores(df)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)), s"doc 1 owns all its shingles: ${out(1L)}")
    assert(out(2L) == ((3L, 0L, 0.0)), s"verbatim repeat owns nothing: ${out(2L)}")
    assert(out(3L) == ((3L, 3L, 1.0)))
  }

  test("zipfRankSlope: an exact 1/rank corpus fits slope -1, r² = 1") {
    // counts 12,6,4,3 = 12/rank for ranks 1..4 → ln c = ln 12 - ln rank
    val text = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++
               Seq.fill(3)("d")
    val df = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.zipfRankSlope(df, topV = 10).collect().head
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-4, s"slope: ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-6, s"r2: ${r.getDouble(3)}")
    // intercept ≈ ln(12) in micro-nats
    assert(math.abs(r.getDouble(2) - math.log(12.0) * 1e6) < 200,
      s"intercept: ${r.getDouble(2)}")
  }

  test("zipfRankSlope: topV bounds the head and the k-boundary tie is pinned") {
    // six tokens, counts 3,3,2,2,1,1 — topV=4 keeps {a,b,c,d} by
    // (count desc, token asc); swapping e/f cannot change the fit
    val text = "a a a b b b c c d d e f"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r4 = TextAnalysis.zipfRankSlope(df, topV = 4).collect().head
    assert(r4.getLong(0) == 4L)
    assert(r4.getDouble(1) < 0, "slope negative on a decaying head")
  }

  test("keynessChi2: source-exclusive terms rank first with the right sign") {
    // "badger" appears only in the focus source, "filler" everywhere;
    // "common" is balanced and must score ~0 with direction 0
    val docs = Seq(
      (1L, "srcA", "badger badger common filler"),
      (2L, "srcA", "badger common filler"),
      (3L, "srcB", "common common filler filler"),
      (4L, "srcB", "common filler filler"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.keynessChi2(docs, "srcA", 10).collect()
    val first = out.head
    assert(first.getAs[String]("token") == "badger", first.toString)
    assert(first.getAs[Int]("direction") == 1)
    assert(first.getAs[Long]("a") == 3L && first.getAs[Long]("b") == 0L)
    val byTok = out.map(r => r.getAs[String]("token") -> r).toMap
    assert(byTok("filler").getAs[Int]("direction") == -1)
    // chi2 is monotone in distinctiveness: exclusive beats skewed beats shared
    assert(first.getAs[Double]("chi2") > byTok("common").getAs[Double]("chi2"))
  }

  test("langSourceMi: zero on independent labels, ln(2) on a 1:1 shard map") {
    import spark.implicits._
    // independent: every (lang, source) cell holds the product mass —
    // each term is p·ln(1) = 0 exactly
    val indep = (for (l <- Seq("en", "de"); s <- Seq("s0", "s1");
                      _ <- 1 to 5) yield (l, s)).toDF("lang", "source")
    val r0 = TextAnalysis.langSourceMi(indep).collect()(0)
    assert(r0.getAs[Long]("n_docs") == 20L && r0.getAs[Long]("n_cells") == 4L)
    assert(r0.getAs[Long]("mi_micronats") == 0L)
    // deterministic shards: source decides the language ⇒ I = H = ln 2
    val sharded = (Seq.fill(5)(("en", "s0")) ++ Seq.fill(5)(("de", "s1")))
      .toDF("lang", "source")
    val r1 = TextAnalysis.langSourceMi(sharded).collect()(0)
    val expected = 2 * math.round(0.5 * math.log(2) * 1e6) // 693148 ≈ ln 2
    assert(r1.getAs[Long]("mi_micronats") == expected)
    assert(r1.getAs[Double]("mi_nats") == expected / 1e6)
  }

  test("ksSourceDrift: identical distributions read 0, disjoint supports read 1") {
    import spark.implicits._
    def docs(rows: Seq[(String, Long)]) =
      rows.zipWithIndex.map { case ((s, n), i) => (i.toLong, s, n) }
        .toDF("doc_id", "source", "n_chars")
    val same = docs(Seq("src0", "src1").flatMap(s =>
      (1L to 10L).map(n => (s, n * 100))))
    val r0 = TextAnalysis.ksSourceDrift(same, "src0", "src1").collect()(0)
    assert(r0.getAs[Long]("n_a") == 10L && r0.getAs[Long]("n_b") == 10L)
    assert(r0.getAs[Long]("d_numerator") == 0L && r0.getAs[Double]("ks_d") == 0.0)
    // src0 entirely below src1: at the support boundary F_a=1, F_b=0
    val split = docs((1L to 10L).map(n => ("src0", n)) ++
                     (1L to 10L).map(n => ("src1", n + 1000)))
    val r1 = TextAnalysis.ksSourceDrift(split, "src0", "src1").collect()(0)
    assert(r1.getAs[Double]("ks_d") == 1.0, r1.toString)
    assert(r1.getAs[Long]("d_at_value") == 10L, "sup sits at src0's max")
  }

  test("wassersteinSourceDrift: single-grid-point corpus reports W1 = 0, " +
       "not an empty frame") {
    import spark.implicits._
    // every doc the same n_chars → one merged-grid value, all lead gaps
    // null: W1 is still well-defined (identical CDFs ⇒ 0)
    val docs = Seq((1L, "src0", 500L), (2L, "src0", 500L), (3L, "src1", 500L))
      .toDF("doc_id", "source", "n_chars")
    val r = TextAnalysis.wassersteinSourceDrift(docs, "src0", "src1").collect()
    assert(r.length == 1, s"expected the 1-row report, got ${r.length}")
    assert(r(0).getAs[Long]("n_a") == 2L && r(0).getAs[Long]("n_b") == 1L)
    assert(r(0).getAs[Long]("grid_points") == 1L)
    assert(r(0).getAs[Double]("w1_distance") == 0.0)
    // one-sided corpus still reports, with the NULL-distance contract
    val oneSided = docs.filter(col("source") === "src0")
    val r1 = TextAnalysis.wassersteinSourceDrift(oneSided, "src0", "src1")
      .collect()
    assert(r1.length == 1 && r1(0).isNullAt(r1(0).fieldIndex("w1_distance")))
  }

  test("goodTuringMass: exact count-of-counts, r*, and singleton mass") {
    import spark.implicits._
    // token counts: a×1, b×1, c×2, d×4 ⇒ fof = {1:2, 2:1, 4:1}, N = 8
    val docs = Seq((1L, "a c c d d"), (2L, "b d d")).toDF("doc_id", "text")
    val out = TextAnalysis.goodTuringMass(docs).collect()
      .map(r => r.getAs[Long]("r") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 4L))
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == 8L && r.getAs[Long]("vocab") == 4L)
    }
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_r") == 2L && r1.getAs[Long]("n_next") == 1L)
    // r*₁ = 2·n₂/n₁ = 1 exactly; unseen mass = n₁/N = 1/4
    assert(r1.getAs[Long]("r_star_micro") == 1000000L)
    assert(r1.getAs[Long]("mass_micro") == 250000L)
    // gap above r=2 (no n₃): raw GT discounts to 0, reported not smoothed
    assert(out(2L).getAs[Long]("r_star_micro") == 0L)
    assert(out(4L).getAs[Long]("mass_micro") == 500000L)
  }

  test("chao1VocabEstimate: exact richness from the planted fof") {
    import spark.implicits._
    // same corpus as the Good–Turing spec: n1 = 2, n2 = 1, vocab = 4
    val docs = Seq((1L, "a c c d d"), (2L, "b d d")).toDF("doc_id", "text")
    val r = TextAnalysis.chao1VocabEstimate(docs).collect()(0)
    assert(r.getAs[Long]("vocab") == 4L && r.getAs[Long]("n_tokens") == 8L)
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 1L)
    assert(r.getAs[Double]("chao1") == 6.0)        // 4 + 2²/(2·1)
    assert(r.getAs[Double]("chao1_bc") == 4.5)     // 4 + 2·1/(2·2)
  }
  test("brierDecomposition: Murphy identity and hand-checked uncertainty") {
    // 8 docs, half 'en'; scores spread across the quartile bins
    val scored = Seq(
      (1L, "en",  4000000.0), (2L, "en",  2000000.0),
      (3L, "en",  1000000.0), (4L, "en",   500000.0),
      (5L, "de", -4000000.0), (6L, "de", -2000000.0),
      (7L, "de", -1000000.0), (8L, "de",  -500000.0))
      .toDF("doc_id", "lang", "mean_logodds_unats")
    val r = graft.ops.TextAnalysis.brierDecomposition(scored).collect()(0)
    assert(r.getAs[Long]("n_docs") == 8L)
    assert(r.getAs[Long]("n_ref") == 4L)
    assert(r.getAs[Double]("uncertainty") == 0.25)
    val identity = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty")
    assert(math.abs(identity - r.getAs[Double]("binned_brier")) < 3e-6)
    val bs = r.getAs[Double]("brier_score")
    assert(bs >= 0.0 && bs <= 1.0)
    // well-separated scores: the classifier is sharp, so the unbinned
    // Brier must sit far below the no-skill uncertainty
    assert(bs < 0.25)
  }
}
