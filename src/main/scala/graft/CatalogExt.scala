package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline extension catalog: deduplication, similarity
  * search, text analysis, multimodal metadata (SURVEY.md §7.2 step 7 + the
  * builder mandate). Hash-based operators use md5 (canonical hex on both
  * engines); floating-point outputs are rounded to 6 decimals after exact or
  * near-exact arithmetic.
  */
object CatalogExt {

  type QueryFn = (SparkSession, String) => DataFrame

  /** DuckDB fragment: distinct whitespace tokens of `text`. */
  private val sqlTokens = "string_split(text, ' ')"

  /** DuckDB fragment: the exact daily-revenue-cents series (twin of
    * [[graft.ops.Stats]]' shared dailyRevenue input) — splice as a CTE body.
    */
  private val sqlDailyRevenue =
    """SELECT CAST(o_orderdate AS DATE) AS day,
      |                CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |         FROM orders GROUP BY 1""".stripMargin

  /** DuckDB CTE chain for the SQ8 family (twin of
    * [[graft.ops.Similarity.sq8TopK]]/sq8Recall): L2-normalize →
    * micro-unit grid (the ONE mirrored rounding) → corpus-trained BIGINT
    * [min,max] ladder → clamp-then-floor 8-bit codes → decoded (×255)
    * integer dots, one double division chain at the end. Splice after
    * `WITH `; produces CTE `s(q_id, vec_id, approx_cos)`. Pre-stripped
    * (no margin pipes) so the outer stripMargin can't eat it.
    */
  private val sqlSq8Ctes: String = Seq(
    "nv AS (SELECT vec_id,",
    "              sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm,",
    "              CAST(embedding AS DOUBLE[]) AS emb",
    "       FROM embeddings),",
    "x0 AS (SELECT vec_id, nrm, generate_subscripts(emb, 1) - 1 AS d, unnest(emb) AS v FROM nv),",
    "x AS (SELECT vec_id, d,",
    "             CASE WHEN nrm = 0 THEN CAST(0 AS BIGINT)",
    "                  ELSE CAST(round(v / nrm * 1000000.0) AS BIGINT) END AS xm",
    "      FROM x0),",
    "st AS (SELECT d, CAST(MIN(xm) AS BIGINT) AS mn, CAST(MAX(xm) AS BIGINT) AS mx",
    "       FROM x WHERE vec_id >= 8 GROUP BY 1),",
    "dc AS (SELECT x.vec_id, x.d,",
    "              CASE WHEN mx = mn THEN mn * 255",
    "                   ELSE mn * 255 + CAST(floor(CAST((least(greatest(xm, mn), mx) - mn) * 255 AS DOUBLE)",
    "                          / CAST(mx - mn AS DOUBLE)) AS BIGINT) * (mx - mn)",
    "              END AS dec255",
    "       FROM x JOIN st USING (d)),",
    "s AS (SELECT q.vec_id AS q_id, c.vec_id,",
    "             round(CAST(SUM(q.dec255 * c.dec255) AS DOUBLE) / 65025.0 / 1e12, 6) AS approx_cos",
    "      FROM dc q JOIN dc c ON q.d = c.d",
    "      WHERE q.vec_id < 8 AND c.vec_id >= 8",
    "      GROUP BY 1, 2)").mkString("\n")

  /** DuckDB fragment: word n-gram shingle list with the <n-token fallback —
    * mirrors [[TextAnalysis.shingles]].
    */
  private def sqlShingles(n: Int): String =
    s"""CASE WHEN len($sqlTokens) >= $n
       |  THEN list_transform(range(1, len($sqlTokens) - ${n - 2}),
       |                      i -> array_to_string(($sqlTokens)[i:i+${n - 1}], ' '))
       |  ELSE [text] END""".stripMargin

  /** DuckDB: per-doc MinHash component i over distinct 3-gram shingles
    * (mirrors [[Dedup.minhashSignature]]).
    */
  private def sqlMinhash(i: Int): String =
    s"list_min(list_transform(list_distinct(${sqlShingles(3)}), t -> md5(t || '#$i')))"

  /** DuckDB simhash-32: explode-form twin of the Spark HOF pipeline in
    * [[Dedup.simhash32]]. Bit b of the per-token 32-bit hash (md5 first 8 hex
    * chars) votes ±1; fingerprint packs the sign bits.
    */
  private val sqlSimhash: String = {
    val bitSums = (0 until 32)
      .map(b => s"CAST(SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s$b")
      .mkString(",\n         ")
    val pack = (0 until 32)
      .map(b => s"(CASE WHEN s$b >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($sqlTokens) AS t FROM documents),
       |hs AS (
       |  SELECT doc_id, CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) AS BIGINT) AS h FROM toks),
       |bitsums AS (
       |  SELECT doc_id,
       |         $bitSums
       |  FROM hs GROUP BY doc_id)
       |SELECT doc_id, $pack AS simhash
       |FROM bitsums ORDER BY doc_id""".stripMargin
  }

  private val stopListSql: String =
    TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  /** DuckDB twin of [[Similarity.signBuckets]] as CTE text (to splice after
    * `WITH `): rebuilds the integer-hash hyperplanes
    * ([[Similarity.planeComponent]] — pure BIGINT ops, bit-identical across
    * engines), dots each embedding against them, and packs per-table sign
    * bits into a bucket. Produces CTE `buckets(vec_id, t, bucket)`.
    * Built with explicit newline joins, not stripMargin, so it can be
    * interpolated into stripMargin'd oracle strings safely.
    */
  /** Shared DuckDB sign-LSH pipeline (planes → dots → buckets). The integer
    * hash chain mirrors [[graft.ops.Similarity.planeComponent]] bit for
    * bit; the two faces below differ ONLY in where `bits` comes from
    * (a literal vs the `nb` CTE), injected through `bitsExpr` and the
    * inner SELECT/FROM — one copy, so a hash or bucket-packing fix cannot
    * drift between the fixed and auto oracles (round-7 review finding).
    */
  private def sqlSignBucketsCore(bitsExpr: String, innerSelect: String,
                                 innerFrom: String): String = Seq(
    s"planes AS (",
    s"  SELECT CAST(j // $bitsExpr AS BIGINT) AS t, CAST(j % $bitsExpr AS BIGINT) AS p, i,",
    s"         CAST(CAST(h AS DOUBLE) / 2147483648.0 - 1.0 AS FLOAT) AS w",
    s"  FROM (",
    s"    SELECT $innerSelect,",
    s"           (j * 104729 + i * 7919 + 12345) AS x0,",
    s"           (x0 * 2654435761) & 4294967295 AS x1,",
    s"           xor(x1, x1 >> 16) AS x2,",
    s"           ((x2 & 2147483647) * 1597334677) & 4294967295 AS x3,",
    s"           xor(x3, x3 >> 13) AS h",
    s"    FROM $innerFrom)),",
    s"dots AS (",
    s"  SELECT e.vec_id, pl.t, pl.p,",
    s"         SUM(CAST(e.embedding[pl.i + 1] AS DOUBLE) * CAST(pl.w AS DOUBLE)) AS dot",
    s"  FROM embeddings e CROSS JOIN planes pl",
    s"  GROUP BY 1, 2, 3),",
    s"buckets AS (",
    s"  SELECT vec_id, t,",
    s"         CAST(SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket",
    s"  FROM dots GROUP BY 1, 2)").mkString("\n")

  private def sqlSignBuckets(nTables: Int, bits: Int, dim: Int = 64): String =
    sqlSignBucketsCore(bits.toString, "j, i",
      s"range(${nTables * bits}) a(j) CROSS JOIN range($dim) b(i)")

  /** [[sqlSignBuckets]] with `bits` COMPUTED from the corpus count the same
    * way [[graft.ops.Similarity.autoBitsPerTable]] does — smallest b with
    * 2^b ≥ count/8, clamped [4, 24], as a pure integer comparison (no
    * float log whose 1-ulp boundary behavior could diverge between
    * engines). Planes are generated to the 24-bit maximum and filtered to
    * `nTables · bits`, so the CTE shape stays static while the bucket
    * width tracks the corpus. Produces CTEs `nb(bits)` and
    * `buckets(vec_id, t, bucket)`.
    */
  private def sqlSignBucketsAuto(nTables: Int, dim: Int = 64): String = Seq(
    s"nb AS (",
    s"  SELECT GREATEST(4, LEAST(24, (",
    s"    SELECT MIN(b) FROM range(25) tb(b)",
    s"    WHERE (CAST(8 AS BIGINT) << b) >= (SELECT COUNT(*) FROM embeddings)))) AS bits),").mkString("\n") +
    "\n" + sqlSignBucketsCore("bits", "j, i, bits",
      s"range(${nTables * 24}) a(j) CROSS JOIN range($dim) b(i) CROSS JOIN nb\n    WHERE j < $nTables * bits")

  /** DuckDB fragment: exact cosine between two embedding-table aliases. */
  private def sqlCos(a: String, b: String): String =
    s"round(list_cosine_similarity(CAST($a.embedding AS DOUBLE[]), CAST($b.embedding AS DOUBLE[])), 6)"

  /** DuckDB twin of [[Similarity.kmeansCentroids]] + final assignment as CTE
    * text (to splice after `WITH `). Reproduces, step by step: seed centroids
    * from the `k` lowest corpus vec_ids; per-iteration rounded-cosine argmax
    * assignment (ties → lower cluster_id); the FIXED-POINT Lloyd update —
    * per-lane `SUM(CAST(round(e·10⁶) AS BIGINT))` (exact, order-independent)
    * divided by `n·10⁶` in double, rounded to float. Every operation is
    * either exact integer arithmetic or an IEEE-defined double/float op on
    * identical inputs, so the centroid bits — and the assignment built on
    * them — match Spark's exactly. Produces CTEs `corpus(vec_id, emb)` and
    * `cent$iters(cluster_id, centroid)`.
    */
  private def sqlKmeans(corpusFilter: String, k: Int, iters: Int,
                        dim: Int = 64): String =
    sqlKmeansCorpus(
      s"SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE $corpusFilter",
      k, iters, dim)

  /** [[sqlKmeans]] with a caller-supplied corpus SELECT (vec_id, emb) —
    * for rows that stage/augment the corpus before clustering. `prefix`
    * namespaces every emitted CTE (`${prefix}corpus`, `${prefix}cent$i`, …)
    * so one statement can host several independent clusterings — the PQ
    * twin instantiates it once per subspace.
    */
  private def sqlKmeansCorpus(corpusSelect: String, k: Int, iters: Int,
                              dim: Int = 64, prefix: String = ""): String = {
    val init = Seq(
      s"${prefix}corpus AS (",
      s"  $corpusSelect),",
      s"${prefix}cent0 AS (",
      s"  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster_id,",
      s"         emb AS centroid",
      s"  FROM (SELECT vec_id, emb FROM ${prefix}corpus ORDER BY vec_id LIMIT $k))")
    val steps = (1 to iters).flatMap { i =>
      Seq(
        s",${prefix}asg$i AS (",
        s"  SELECT vec_id, cluster_id, emb FROM (",
        s"    SELECT c.vec_id, kk.cluster_id, c.emb,",
        s"           row_number() OVER (PARTITION BY c.vec_id",
        s"             ORDER BY round(list_cosine_similarity(c.emb, kk.centroid), 6) DESC,",
        s"                      kk.cluster_id) AS rn",
        s"    FROM ${prefix}corpus c CROSS JOIN ${prefix}cent${i - 1} kk) WHERE rn = 1),",
        s"${prefix}cent$i AS (",
        s"  SELECT cluster_id, list(CAST(lane AS DOUBLE) ORDER BY pos) AS centroid FROM (",
        s"    SELECT cluster_id, pos,",
        s"           CAST(CAST(SUM(fp) AS DOUBLE) / (COUNT(*) * 1000000.0) AS FLOAT) AS lane",
        s"    FROM (SELECT cluster_id, unnest(range(1, ${dim + 1})) AS pos,",
        s"                 CAST(round(unnest(emb) * 1000000.0) AS BIGINT) AS fp",
        s"          FROM ${prefix}asg$i)",
        s"    GROUP BY cluster_id, pos)",
        s"  GROUP BY cluster_id)")
    }
    (init ++ steps).mkString("\n")
  }

  /** PQ subspace count shared by the Spark side and the DuckDB twins of the
    * pq_* rows — pqTopK's measured default (PqProbe sweep).
    */
  private val pqM = 16

  /** DuckDB twin of the PQ machinery ([[Similarity.pqCodebooks]] /
    * [[Similarity.pqEncode]]): one [[sqlKmeansCorpus]] instance per subspace
    * over the sliced corpus (`pqsrc`, emitted here too), plus per-subspace
    * encode CTEs `pq${s}enc(vec_id, code)` — rounded-cosine argmax against
    * the trained book, ties → lower code, exactly [[Similarity.pqCodeExpr]].
    */
  private def sqlPqBooks(corpusFilter: String, m: Int, k: Int,
                         iters: Int, dim: Int): String = {
    val subDim = dim / m
    val books = (0 until m).map { s =>
      val lo = s * subDim + 1; val hi = (s + 1) * subDim
      sqlKmeansCorpus(
        s"SELECT vec_id, emb[$lo:$hi] AS emb FROM pqsrc",
        k, iters, subDim, prefix = s"pq$s")
    }
    val encs = (0 until m).map { s =>
      s"""pq${s}enc AS (
         |  SELECT vec_id, cluster_id AS code FROM (
         |    SELECT c.vec_id, kk.cluster_id,
         |           row_number() OVER (PARTITION BY c.vec_id
         |             ORDER BY round(list_cosine_similarity(c.emb, kk.centroid), 6) DESC,
         |                      kk.cluster_id) AS rn
         |    FROM pq${s}corpus c CROSS JOIN pq${s}cent$iters kk) WHERE rn = 1)""".stripMargin
    }
    (Seq(s"""pqsrc AS (
            |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
            |  FROM embeddings WHERE $corpusFilter)""".stripMargin)
      ++ books ++ encs).mkString(",\n")
  }

  /** Shared CTE chain for the pq_* rows (to splice after `WITH `): the
    * [[sqlPqBooks]] training + encode chain over `vec_id >= 8`, queries `q`
    * with rounded norms, per-subspace rounded dot tables `qt$s` and
    * codeword-norm² tables `nt$s`, and the ADC-scored relation `scored`
    * (q_id, vec_id, adc_score) with Spark's left-fold association
    * parenthesized explicitly — the twin of [[graft.ops.Similarity.pqTopK]]
    * before its top-k.
    */
  private lazy val sqlPqScoredCtes: String = {
    val subDim = 64 / pqM
    val qtCtes = (0 until pqM).map { s =>
      val lo = s * subDim + 1; val hi = (s + 1) * subDim
      s"qt$s AS (SELECT q.q_id, kk.cluster_id AS code, " +
      s"round(list_inner_product(q.emb[$lo:$hi], kk.centroid), 6) AS t " +
      s"FROM q CROSS JOIN pq${s}cent1 kk)"
    }.mkString(",\n")
    val ntCtes = (0 until pqM).map { s =>
      s"nt$s AS (SELECT cluster_id AS code, " +
      s"round(list_inner_product(centroid, centroid), 6) AS n2 " +
      s"FROM pq${s}cent1)"
    }.mkString(",\n")
    // Lookup tables folded to (code→value) LISTS rather than joinable
    // relations: a first cut joined all 16 qt + 16 nt tables into the
    // scored FROM directly, and DuckDB's join reorderer — free to start by
    // chaining the tiny qt tables on q_id alone — went combinatorial on
    // the 3× replica (>230 s; 1.2 s at 1×). With one 8-row `qtab` (all
    // per-query lists pre-joined on q_id — ≤8-row intermediates in ANY
    // order) and one 1-row `ntab`, every join order the optimizer can pick
    // is safe, and the per-row lookup is list indexing — the relational
    // mirror of the Spark kernel's table indexing.
    val tlJoins = (0 until pqM).map { s =>
      s"tl$s AS (SELECT q_id, list(code ORDER BY code) AS cs$s, " +
      s"list(t ORDER BY code) AS ts$s FROM qt$s GROUP BY q_id)"
    }.mkString(",\n")
    val nlCtes = (0 until pqM).map { s =>
      s"nl$s AS (SELECT list(code ORDER BY code) AS ncs$s, " +
      s"list(n2 ORDER BY code) AS ns$s FROM nt$s)"
    }.mkString(",\n")
    val qtabJoins = (0 until pqM).map(s => s"JOIN tl$s USING (q_id)").mkString(" ")
    val ntabCross = (1 until pqM).map(s => s"CROSS JOIN nl$s").mkString(" ")
    // left-fold parenthesization — Spark's reduce(_ + _) association
    def foldSum(terms: Seq[String]): String = terms.reduce((a, b) => s"($a + $b)")
    val dotSum = foldSum((0 until pqM).map(s =>
      s"qtab.ts$s[list_position(qtab.cs$s, c.c$s)]"))
    val n2Sum = foldSum((0 until pqM).map(s =>
      s"ntab.ns$s[list_position(ntab.ncs$s, c.c$s)]"))
    val encJoins = (1 until pqM)
      .map(s => s"JOIN pq${s}enc e$s USING (vec_id)").mkString(" ")
    s"""${sqlPqBooks("vec_id >= 8", pqM, 16, 1, 64)},
       |q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS emb,
       |             round(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
       |                                           CAST(embedding AS DOUBLE[]))), 6) AS qn
       |      FROM embeddings WHERE vec_id < 8),
       |$qtCtes,
       |$ntCtes,
       |$tlJoins,
       |$nlCtes,
       |codes AS (
       |  SELECT vec_id, ${(0 until pqM).map(s => s"e$s.code AS c$s").mkString(", ")}
       |  FROM pq0enc e0 $encJoins),
       |qtab AS (SELECT q.q_id, q.qn, ${(0 until pqM).map(s => s"cs$s, ts$s").mkString(", ")}
       |         FROM q $qtabJoins),
       |ntab AS (SELECT * FROM nl0 $ntabCross),
       |scored AS (
       |  SELECT qtab.q_id, c.vec_id,
       |         CASE WHEN $n2Sum = 0 THEN CAST(0 AS DOUBLE)
       |              ELSE round($dotSum / (qtab.qn * sqrt($n2Sum)), 6)
       |         END AS adc_score
       |  FROM codes c CROSS JOIN qtab CROSS JOIN ntab)""".stripMargin
  }

  /** Shared CTE chain for the Naive-Bayes quality rows (to splice after
    * `WITH `): the full fit+score twin of
    * [[graft.ops.TextAnalysis.nbClassifierScores]] at refLang='en',
    * vocabSize=50, ending in `nbdoc(doc_id, lang, n_tokens, logodds_unats,
    * mean_logodds_unats)`.
    */
  private lazy val sqlNbScoredCtes: String =
    s"""toks AS (
       |  SELECT doc_id, lang, unnest($sqlTokens) AS t FROM documents),
       |cls AS (
       |  SELECT t,
       |         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cr,
       |         CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cb,
       |         COUNT(*) AS ct
       |  FROM toks GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(cb) AS BIGINT) AS nb FROM cls),
       |w AS (
       |  SELECT t,
       |         CAST(round(ln((nb + 50) / (cb + 1.0)) * 1000000) AS BIGINT)
       |           - CAST(round(ln((nr + 50) / (cr + 1.0)) * 1000000) AS BIGINT) AS wt
       |  FROM (SELECT t, cr, cb FROM cls ORDER BY ct DESC, t ASC LIMIT 50)
       |  CROSS JOIN tot),
       |oov AS (
       |  SELECT CAST(round(ln((nb + 50) / 1.0) * 1000000) AS BIGINT)
       |           - CAST(round(ln((nr + 50) / 1.0) * 1000000) AS BIGINT) AS wt
       |  FROM tot),
       |nbtok AS (
       |  SELECT k.doc_id, k.lang, COALESCE(w.wt, o.wt) AS wt
       |  FROM toks k LEFT JOIN w ON k.t = w.t CROSS JOIN oov o),
       |nbdoc AS (
       |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
       |         CAST(SUM(wt) AS BIGINT) AS logodds_unats,
       |         CAST(SUM(wt) AS DOUBLE) / COUNT(*) AS mean_logodds_unats
       |  FROM nbtok GROUP BY 1, 2)""".stripMargin

  /** Shared CTE chain for the winnowing rows (to splice after `WITH `):
    * the twin of [[graft.ops.Dedup.winnowingFingerprints]] at k=4, w=4,
    * ending in `wfp(doc_id, pos, gram_hash)` — per-frame string min over
    * hash || padded descending position (rightmost-tie rule), full frames
    * plus the pos-0 short-doc fallback.
    */
  private lazy val sqlWinnowCtes: String =
    s"""wgl AS (SELECT doc_id, ${sqlShingles(4)} AS gl FROM documents),
       |wgrams AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, md5(gl[i]) AS h
       |  FROM (SELECT doc_id, gl, unnest(range(1, len(gl) + 1)) AS i FROM wgl)),
       |wframed AS (
       |  SELECT doc_id, pos,
       |         min(h || lpad(CAST(999999999 - pos AS VARCHAR), 9, '0'))
       |           OVER (PARTITION BY doc_id ORDER BY pos
       |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
       |         count(*) OVER (PARTITION BY doc_id ORDER BY pos
       |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS nf,
       |         count(*) OVER (PARTITION BY doc_id) AS total
       |  FROM wgrams),
       |wsel AS (
       |  SELECT DISTINCT doc_id, sel FROM wframed
       |  WHERE nf = 4 OR (total < 4 AND pos = 0)),
       |wfp AS (
       |  SELECT doc_id,
       |         CAST(999999999 - CAST(substr(sel, 33, 9) AS BIGINT) AS BIGINT) AS pos,
       |         substr(sel, 1, 32) AS gram_hash
       |  FROM wsel)""".stripMargin

  /** DuckDB twin of [[Curation.hashBucket]]: first 8 md5 hex chars of the
    * stringified key as an integer, mod `mod`.
    */
  private def sqlHashBucket(key: String, mod: Int): String =
    s"CAST(CAST('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) % $mod"

  private val sqlHashBucket100: String = sqlHashBucket("doc_id", 100)

  /** Target mixture proportions for `weighted_mixture_sample` — values whose
    * decimal literals parse to identical doubles in Scala and DuckDB (every
    * short decimal does: both round to nearest).
    */
  private val mixtureWeights: Map[String, Double] =
    Map("de" -> 0.15, "en" -> 0.4, "es" -> 0.1, "fr" -> 0.1, "zh" -> 0.25)

  private val sqlMixtureWeights: String =
    mixtureWeights.toSeq.sorted
      .map { case (g, wt) => s"('$g', CAST($wt AS DOUBLE))" }.mkString(", ")

  val entries: Seq[(String, QueryFn, Option[String])] = Seq(

    // ── exact dedup by content hash (empty result is legitimate: the corpus
    //    plants near-dups, not byte-dups; the operator is the 100 TB exact
    //    pass that runs before any near-dup pass).
    ("exact_dedup_docs",
      (spark, dir) =>
        Dedup.exactDupGroups(Tables.documents(spark, dir)).orderBy(col("content_hash")),
      Some("""SELECT md5(text) AS content_hash, COUNT(*) AS n, MIN(doc_id) AS canonical_id
             |FROM documents GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1""".stripMargin)),

    // ── reorder-insensitive dedup: same distinct-token set ⇒ same group.
    ("token_set_dedup",
      (spark, dir) =>
        Tables.documents(spark, dir)
          .groupBy(Dedup.tokenSetHash(col("text")).as("set_hash"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("canonical_id"))
          .filter(col("n") > 1)
          .orderBy(col("set_hash")),
      Some(s"""SELECT md5(array_to_string(list_sort(list_distinct($sqlTokens)), ' ')) AS set_hash,
              |       COUNT(*) AS n, MIN(doc_id) AS canonical_id
              |FROM documents GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1""".stripMargin)),

    // ── MinHash signatures (k=8) via the explode+aggregate table form.
    ("minhash_signatures",
      (spark, dir) =>
        Dedup.minhashSignatureTable(Tables.documents(spark, dir), 8)
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, ${(0 until 8).map(i => s"${sqlMinhash(i)} AS s$i").mkString(",\n       ")}
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── MinHash+LSH banding: candidate near-dup pairs (4 bands × 2 rows).
    ("lsh_candidate_pairs",
      (spark, dir) =>
        Dedup.lshCandidatePairs(Tables.documents(spark, dir), 8, 2)
          .orderBy(col("doc_a"), col("doc_b")),
      Some {
        val sigs = (0 until 8).map(i => s"${sqlMinhash(i)} AS s$i").mkString(", ")
        val bands = (0 until 4).map(i => s"md5(s${2 * i} || '|' || s${2 * i + 1}) AS b$i").mkString(", ")
        val joins = (0 until 4).map(i =>
          s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             |FROM bands a JOIN bands b ON a.b$i = b.b$i AND a.doc_id < b.doc_id""".stripMargin)
          .mkString("\nUNION\n")
        s"""WITH sigs AS (SELECT doc_id, $sigs FROM documents),
           |bands AS (SELECT doc_id, $bands FROM sigs)
           |SELECT DISTINCT doc_a, doc_b FROM ($joins)
           |ORDER BY doc_a, doc_b""".stripMargin
      }),

    // ── SimHash near-dup pairs via pigeonhole blocking (the pairing step
    //    the fingerprints exist for): 60-bit simhash, 4×15-bit blocks —
    //    Hamming ≤ 3 guarantees a shared block — equi-join on (block, key),
    //    exact bit_count(xor) rescore. The oracle rebuilds the 60-lane
    //    fingerprint and the same block join.
    ("simhash_neardup_pairs",
      (spark, dir) =>
        Dedup.simhashNearDups(Tables.documents(spark, dir))
          .orderBy(col("doc_a"), col("doc_b")),
      Some {
        val bitSums = (0 until 60)
          .map(b => s"CAST(SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s$b")
          .mkString(",\n       ")
        val pack = (0 until 60)
          .map(b => s"(CASE WHEN s$b >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)")
          .mkString(" + ")
        s"""WITH toks AS (SELECT doc_id, unnest($sqlTokens) AS t FROM documents),
           |hs AS (SELECT doc_id, CAST(CAST('0x' || substr(md5(t), 1, 15) AS UBIGINT) AS BIGINT) AS h FROM toks),
           |bitsums AS (
           |  SELECT doc_id,
           |       $bitSums
           |  FROM hs GROUP BY doc_id),
           |fp AS (SELECT doc_id, $pack AS simhash FROM bitsums),
           |blk AS (
           |  SELECT doc_id, simhash, b AS blk, (simhash >> (b * 15)) & 32767 AS key
           |  FROM fp CROSS JOIN range(4) r(b))
           |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
           |FROM blk a JOIN blk b ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
           |ORDER BY doc_a, doc_b""".stripMargin
      }),

    // ── cross-batch (incremental) LSH dedup: the new-batch-vs-existing-
    //    corpus form a production ingest runs per batch — incoming docs
    //    (doc_id % 5 = 0) banded against the rest as the standing corpus,
    //    candidate = any shared band. The oracle rebuilds both band tables
    //    and unions the per-band joins; n_bands counts colliding bands.
    ("incremental_dedup_check",
      (spark, dir) => {
        val docs = Tables.documents(spark, dir)
        Dedup.incrementalLshDups(
            docs.filter(col("doc_id") % 5 === 0),
            docs.filter(col("doc_id") % 5 =!= 0))
          .orderBy(col("doc_id"), col("dup_of"))
      },
      Some {
        val sigs = (0 until 8).map(i => s"${sqlMinhash(i)} AS s$i").mkString(", ")
        val bandCols = (0 until 4).map(i => s"md5(s${2 * i} || '|' || s${2 * i + 1}) AS b$i").mkString(", ")
        val joins = (0 until 4).map(i =>
          s"""SELECT i.doc_id, e.doc_id AS dup_of
             |FROM inc i JOIN ex e ON i.b$i = e.b$i""".stripMargin)
          .mkString("\nUNION ALL\n")
        s"""WITH sigs AS (SELECT doc_id, $sigs FROM documents),
           |bands AS (SELECT doc_id, $bandCols FROM sigs),
           |inc AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
           |ex AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
           |pairs AS ($joins)
           |SELECT doc_id, dup_of, COUNT(*) AS n_bands
           |FROM pairs GROUP BY doc_id, dup_of
           |ORDER BY doc_id, dup_of""".stripMargin
      }),

    // ── exact 3-gram Jaccard near-dup pairs (threshold 0.5 separates the
    //    corpus's planted near-dups from background similarity). The df cap
    //    is the 100 TB stop-shingle guard; 50 is far above this corpus's max
    //    shingle df (25 at sf0.1), so the guard is exercised without changing
    //    the result — at real scale it would prune ubiquitous shingles that
    //    otherwise blow up the inverted-index join quadratically.
    // ── Weighted shingle-TF cosine pairs (Dedup.tfCosinePairs): the
    //    frequency-weighted complement to ngram_jaccard_dups — same
    //    inverted-index skeleton, TF-weighted dot + norms instead of set
    //    overlap; minDot floors degenerate single-shingle matches. The
    //    threshold tests the ROUNDED cosine (mirrored) so both engines cut
    //    identically.
    ("tf_cosine_dups",
      (spark, dir) =>
        Dedup.tfCosinePairs(Tables.documents(spark, dir), 3, 0.7,
            maxShingleDf = 50, minDot = 5L)
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH sh0 AS (
              |  SELECT doc_id, unnest(${sqlShingles(3)}) AS g FROM documents),
              |tf0 AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS tf FROM sh0 GROUP BY 1, 2),
              |keep AS (SELECT g FROM (SELECT g, COUNT(*) AS df FROM tf0 GROUP BY g) WHERE df <= 50),
              |p AS (SELECT tf0.doc_id, tf0.g, tf0.tf FROM tf0 JOIN keep USING (g)),
              |norms AS (SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2 FROM p GROUP BY 1),
              |dots AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
              |  FROM p a JOIN p b ON a.g = b.g AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2
              |  HAVING SUM(a.tf * b.tf) >= 5)
              |SELECT doc_a, doc_b, dot,
              |       round(CAST(dot AS DOUBLE)
              |             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
              |FROM dots
              |JOIN norms na ON doc_a = na.doc_id
              |JOIN norms nb ON doc_b = nb.doc_id
              |WHERE round(CAST(dot AS DOUBLE)
              |            / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) >= 0.7
              |ORDER BY doc_a, doc_b""".stripMargin)),

    ("ngram_jaccard_dups",
      (spark, dir) =>
        Dedup.ngramJaccardPairs(Tables.documents(spark, dir), 3, 0.5, maxShingleDf = 50)
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH sh0 AS (
              |  SELECT DISTINCT doc_id, unnest(${sqlShingles(3)}) AS g FROM documents),
              |keep AS (SELECT g FROM (SELECT g, COUNT(*) AS df FROM sh0 GROUP BY g) WHERE df <= 50),
              |sh AS (SELECT sh0.doc_id, sh0.g FROM sh0 JOIN keep USING (g)),
              |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
              |pairs AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
              |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT doc_a, doc_b,
              |       CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) AS jaccard
              |FROM pairs
              |JOIN sizes sa ON doc_a = sa.doc_id
              |JOIN sizes sb ON doc_b = sb.doc_id
              |WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // ── duplicated token spans (the substring-dedup pass of Lee et al.
    //    2021, restated relationally): every maximal span of ≥8 consecutive
    //    tokens whose every 8-token window appears in ≥2 distinct documents.
    //    Gaps-and-islands over duplicated window positions replaces the
    //    suffix array — no global suffix sort, shuffle ∝ distinct window
    //    hashes. The window key is internal (no output column carries it),
    //    so each engine uses its natural hash — Spark xxhash64 (8-byte
    //    primitive shuffle key), the oracle an md5 prefix — and the row
    //    hash pins the SEMANTICS: the engines agree on every span unless a
    //    64-bit collision hits either side (Dedup scaladoc).
    ("duplicate_spans",
      (spark, dir) =>
        Dedup.duplicateSpans(Tables.documents(spark, dir), 8, 2)
          .orderBy(col("doc_id"), col("span_start")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |grams AS (
             |  SELECT doc_id, i - 1 AS pos,
             |         substr(md5(array_to_string(list_slice(t, i, i + 7), ' ')), 1, 16) AS gkey
             |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
             |        FROM toks WHERE len(t) >= 8)),
             |dup AS (SELECT gkey FROM grams GROUP BY gkey HAVING COUNT(DISTINCT doc_id) >= 2),
             |dp AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gkey)),
             |isl AS (SELECT doc_id, pos,
             |               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
             |        FROM dp)
             |SELECT doc_id, MIN(pos) AS span_start,
             |       MAX(pos) - MIN(pos) + 8 AS span_tokens
             |FROM isl GROUP BY doc_id, island
             |ORDER BY doc_id, span_start""".stripMargin)),

    // ── winnowing fingerprints (Schleimer et al. 2003, the MOSS sketch):
    //    per-frame min k-gram hash, ties rightmost, encoded as one string
    //    min over h || padded-descending-pos so both engines compute the
    //    tie rule identically. Selected set ≈ 2/(w+1) of positions; any
    //    ≥ w+k−1-token cross-doc match shares a fingerprint.
    ("winnowing_fingerprints",
      (spark, dir) =>
        Dedup.winnowingFingerprints(Tables.documents(spark, dir), 4, 4)
          .orderBy(col("doc_id"), col("pos")),
      Some(s"""WITH $sqlWinnowCtes
              |SELECT doc_id, pos, gram_hash FROM wfp
              |ORDER BY doc_id, pos""".stripMargin)),

    // ── the MOSS comparison step over the winnowing sketch: doc pairs
    //    sharing >= 2 selected fingerprints, overlap coefficient over the
    //    df-capped universe. Posting lists are already winnowed to
    //    ~2/(w+1) density before the inverted-index self-join.
    ("winnowing_overlap_pairs",
      (spark, dir) =>
        Dedup.winnowingOverlapPairs(Tables.documents(spark, dir), 4, 4,
            minShared = 2, maxDf = 50)
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $sqlWinnowCtes,
              |fps AS (SELECT DISTINCT doc_id, gram_hash FROM wfp),
              |dfc AS (SELECT gram_hash FROM fps GROUP BY gram_hash HAVING COUNT(*) <= 50),
              |cp AS (SELECT f.doc_id, f.gram_hash FROM fps f JOIN dfc USING (gram_hash)),
              |sz AS (SELECT doc_id, COUNT(*) AS sz FROM cp GROUP BY 1),
              |pr AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
              |  FROM cp a JOIN cp b USING (gram_hash) WHERE a.doc_id < b.doc_id
              |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
              |SELECT pr.doc_a, pr.doc_b, pr.n_shared,
              |       CAST(pr.n_shared AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS overlap
              |FROM pr JOIN sz sa ON sa.doc_id = pr.doc_a
              |        JOIN sz sb ON sb.doc_id = pr.doc_b
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // ── per-document duplication pressure: the fraction of each doc's
    //    8-token windows that appear in >=2 distinct docs (the RefinedWeb
    //    curation report; the thresholdable per-doc signal upstream of span
    //    removal). Shares the positioned-gram machinery and dup head with
    //    duplicate_spans; the fraction is one exact-integer division.
    ("dup_window_stats",
      (spark, dir) =>
        Dedup.dupWindowStats(Tables.documents(spark, dir), 8, 2)
          .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |grams AS (
             |  SELECT doc_id, i - 1 AS pos,
             |         substr(md5(array_to_string(list_slice(t, i, i + 7), ' ')), 1, 16) AS gkey
             |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
             |        FROM toks WHERE len(t) >= 8)),
             |dup AS (SELECT gkey, 1 AS d FROM grams GROUP BY gkey HAVING COUNT(DISTINCT doc_id) >= 2)
             |SELECT g.doc_id, COUNT(*) AS n_windows,
             |       CAST(SUM(COALESCE(dup.d, 0)) AS BIGINT) AS n_dup_windows,
             |       CAST(SUM(COALESCE(dup.d, 0)) AS DOUBLE) / COUNT(*) AS dup_frac
             |FROM grams g LEFT JOIN dup USING (gkey)
             |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin)),

    // ── the removal half of substring dedup: rewrite the corpus dropping
    //    every duplicated 8-token window outside its owner (min-doc_id)
    //    occurrence. The hash covers the full rewritten text of every doc,
    //    so the oracle pins the rewrite byte-for-byte, not just the counts.
    ("span_deduped_docs",
      (spark, dir) =>
        Dedup.spanDedupedDocs(Tables.documents(spark, dir), 8)
          .orderBy(col("doc_id")),
      Some("""WITH toks0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |grams AS (
             |  SELECT doc_id, i - 1 AS pos,
             |         substr(md5(array_to_string(list_slice(t, i, i + 7), ' ')), 1, 16) AS gkey
             |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
             |        FROM toks0 WHERE len(t) >= 8)),
             |owners AS (
             |  SELECT gkey, MIN(doc_id) AS owner_doc FROM grams
             |  GROUP BY gkey HAVING MIN(doc_id) <> MAX(doc_id)),
             |covered AS (
             |  SELECT DISTINCT doc_id, pos + unnest(range(0, 8)) AS tpos
             |  FROM (SELECT g.doc_id, g.pos FROM grams g JOIN owners o USING (gkey)
             |        WHERE g.doc_id <> o.owner_doc)),
             |toks AS (
             |  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) - 1 AS i FROM toks0)
             |SELECT t.doc_id,
             |       COUNT(*) AS n_tokens,
             |       COUNT(c.tpos) AS n_tokens_removed,
             |       COALESCE(string_agg(CASE WHEN c.tpos IS NULL THEN t.tok END, ' ' ORDER BY t.i), '') AS clean_text
             |FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.i = c.tpos
             |GROUP BY t.doc_id
             |ORDER BY t.doc_id""".stripMargin)),

    // ── near-dup clustering: connected components over the Jaccard pair
    //    graph (iterative min-label propagation) vs a DuckDB recursive-CTE
    //    transitive closure — the canonical-doc selection step of a dedup
    //    pipeline.
    ("dup_clusters",
      (spark, dir) =>
        Dedup.dupClusters(Dedup.ngramJaccardPairs(Tables.documents(spark, dir), 3, 0.5))
          .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE sh AS (
              |  SELECT DISTINCT doc_id, unnest(${sqlShingles(3)}) AS g FROM documents),
              |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
              |cnt AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
              |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |pairs0 AS (
              |  SELECT doc_a, doc_b FROM cnt
              |  JOIN sizes sa ON doc_a = sa.doc_id
              |  JOIN sizes sb ON doc_b = sb.doc_id
              |  WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
              |edges AS (
              |  SELECT doc_a AS a, doc_b AS b FROM pairs0
              |  UNION ALL SELECT doc_b, doc_a FROM pairs0),
              |reach(a, b) AS (
              |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
              |SELECT a AS doc_id, MIN(b) AS canonical_id
              |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin)),

    // ── exact interpolated percentiles per stream key (Spark `percentile`
    //    vs DuckDB `quantile_cont`, same interpolation formula).
    ("value_percentiles",
      (spark, dir) =>
        Tables.events(spark, dir)
          .groupBy(col("event_type"))
          .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
               round(expr("percentile(value, 0.95)"), 6).as("p95"),
               Scalars.moneySum(col("value")).as("value_sum"))
          .transform(CatalogCore.orderedReport(_, col("event_type"))),
      Some("""SELECT event_type,
             |       round(quantile_cont(value, 0.5), 6) AS p50,
             |       round(quantile_cont(value, 0.95), 6) AS p95,
             |       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ── SimHash-32 fingerprints (explode + 32-lane aggregate, codegen'd).
    ("simhash_fingerprints",
      (spark, dir) =>
        Dedup.simhash32Table(Tables.documents(spark, dir)).orderBy(col("doc_id")),
      Some(sqlSimhash)),

    // ── brute-force cosine top-k (query vecs broadcast, corpus streams).
    ("cosine_topk",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.cosineTopK(emb.filter(col("vec_id") < 8),
                              emb.filter(col("vec_id") >= 8), 5)
          .transform(CatalogCore.orderedReport(_,
            col("q_id"), col("cos_sim").desc, col("vec_id")))
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.q_id, e.vec_id,
             |         round(list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
             |  FROM q CROSS JOIN embeddings e WHERE e.vec_id >= 8)
             |SELECT q_id, vec_id, cos_sim FROM scored
             |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) <= 5
             |ORDER BY q_id, cos_sim DESC, vec_id""".stripMargin)),

    // ── embedding cosine near-dup pairs above 0.4 — the exact O(N²)
    //    baseline kept for small-SF audits and as the recall oracle; the
    //    default 100 TB pairs path is `embedding_neardup_lsh` below. The
    //    catalog runs it over a deterministic 1-in-4 audit slice (vec_id ≡ 0
    //    mod 4): the operator's cost is quadratic BY DESIGN, so the audit
    //    bounds its input instead of paying N²/2 on the full corpus every
    //    run — exactly how it would be deployed next to the LSH path at
    //    scale. SimilaritySpec still exercises the full exact form as the
    //    recall oracle.
    ("embedding_neardup_pairs",
      (spark, dir) =>
        Similarity.nearDupPairs(
            Tables.embeddings(spark, dir).filter(col("vec_id") % 4 === 0), 0.4)
          .orderBy(col("vec_a"), col("vec_b")),
      Some("""WITH sl AS (SELECT * FROM embeddings WHERE vec_id % 4 = 0)
             |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
             |FROM sl a JOIN sl b ON a.vec_id < b.vec_id
             |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
             |ORDER BY vec_a, vec_b""".stripMargin)),

    // ── sign-LSH near-dup pairs: the 100 TB default pairs path (bucketed
    //    equi-join + exact rescore, no nested-loop join — PlanSpec asserts).
    //    The oracle SIMULATES THE SAME LSH in SQL (hash-built planes →
    //    buckets → collisions → rescore), so the hash match pins the
    //    algorithm itself, independent of recall: a recall-lossy candidate
    //    set would diverge from an exact-pairs oracle by design.
    //    SF CEILING (measured, SCALE.md "Measured scale-up"): this row pins
    //    FIXED 16×8 buckets for hash reproducibility at the test SFs; with
    //    bits fixed, occupancy grows ∝ corpus and pair work ∝ corpus² (27×
    //    time at 9× data). The production entry point is the auto-sized
    //    `embedding_neardup_auto` row below — this fixed row is a
    //    known-width audit, valid to ~10× the sf0.1 corpus.
    ("embedding_neardup_lsh",
      (spark, dir) =>
        Similarity.lshNearDupPairs(Tables.embeddings(spark, dir), 0.4)
          .orderBy(col("vec_a"), col("vec_b")),
      Some(s"""WITH ${sqlSignBuckets(16, 8)},
              |cand AS (
              |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
              |  FROM buckets a JOIN buckets b
              |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
              |scored AS (
              |  SELECT vec_a, vec_b, ${sqlCos("ea", "eb")} AS cos_sim
              |  FROM cand
              |  JOIN embeddings ea ON vec_a = ea.vec_id
              |  JOIN embeddings eb ON vec_b = eb.vec_id)
              |SELECT vec_a, vec_b, cos_sim FROM scored
              |WHERE cos_sim >= 0.4 ORDER BY vec_a, vec_b""".stripMargin)),

    // ── the PRODUCTION near-dup path, driver-hashed: bits auto-sized from
    //    the corpus count ([[Similarity.autoBitsPerTable]] — smallest b with
    //    2^b ≥ n/8, held-occupancy scaling, the shape that survived the 9×
    //    scale test). The oracle recomputes the SAME bits from its own
    //    COUNT(*) with the same integer comparison, then runs the same
    //    plane/bucket/rescore pipeline — so the hash pins not just the LSH
    //    but the auto-sizing policy itself: a bits drift at any SF breaks
    //    the row on both engines identically or not at all.
    ("embedding_neardup_auto",
      (spark, dir) =>
        Similarity.lshNearDupPairsAuto(Tables.embeddings(spark, dir), 0.4)
          .orderBy(col("vec_a"), col("vec_b")),
      Some(s"""WITH ${sqlSignBucketsAuto(16)},
              |cand AS (
              |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
              |  FROM buckets a JOIN buckets b
              |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
              |scored AS (
              |  SELECT vec_a, vec_b, ${sqlCos("ea", "eb")} AS cos_sim
              |  FROM cand
              |  JOIN embeddings ea ON vec_a = ea.vec_id
              |  JOIN embeddings eb ON vec_b = eb.vec_id)
              |SELECT vec_a, vec_b, cos_sim FROM scored
              |WHERE cos_sim >= 0.4 ORDER BY vec_a, vec_b""".stripMargin)),

    // ── approximate NN via sign-random-projection buckets. The oracle
    //    simulates the same multi-table LSH (8×4 planes, union of collisions,
    //    dedup, exact rescore, top-5) — full hash match on an approximate
    //    operator because the planes are engine-portable integer hashes.
    ("ann_lsh_topk",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.annTopK(emb.filter(col("vec_id") < 8), emb.filter(col("vec_id") >= 8), 5)
          .transform(CatalogCore.orderedReport(_,
            col("q_id"), col("cos_sim").desc, col("vec_id")))
      },
      Some(s"""WITH ${sqlSignBuckets(8, 4)},
              |cand AS (
              |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS vec_id
              |  FROM buckets q JOIN buckets c ON q.t = c.t AND q.bucket = c.bucket
              |  WHERE q.vec_id < 8 AND c.vec_id >= 8),
              |scored AS (
              |  SELECT cand.q_id, cand.vec_id, ${sqlCos("eq", "ec")} AS cos_sim
              |  FROM cand
              |  JOIN embeddings eq ON cand.q_id = eq.vec_id
              |  JOIN embeddings ec ON cand.vec_id = ec.vec_id)
              |SELECT q_id, vec_id, cos_sim FROM scored
              |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) <= 5
              |ORDER BY q_id, cos_sim DESC, vec_id""".stripMargin)),

    // ── ANN approximation quality as a driver-hashed number: per-query
    //    recall of the sign-LSH top-k against the exact brute-force top-k.
    //    Both sides are individually oracle-able (ann_lsh_topk, cosine_topk),
    //    so their join is too — the hash pins not just the operators but the
    //    approximation quality itself (a recall regression from a plane or
    //    bucketing bug changes this row even if each side stays
    //    self-consistent). The SimilaritySpec recall bound stays as the
    //    library-level floor; this is its hash-exact catalog face.
    ("ann_recall",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        val qs = emb.filter(col("vec_id") < 8)
        val corpus = emb.filter(col("vec_id") >= 8)
        val exact = Similarity.cosineTopK(qs, corpus, 5).select(col("q_id"), col("vec_id"))
        val ann = Similarity.annTopK(qs, corpus, 5)
          .select(col("q_id"), col("vec_id")).withColumn("hit", lit(1L))
        exact.join(ann, Seq("q_id", "vec_id"), "left_outer")
          .groupBy(col("q_id"))
          .agg(count(lit(1)).as("n_exact"),
               sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))
          .transform(CatalogCore.orderedReport(_, col("q_id")))
      },
      Some(s"""WITH ${sqlSignBuckets(8, 4)},
              |cand AS (
              |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS vec_id
              |  FROM buckets q JOIN buckets c ON q.t = c.t AND q.bucket = c.bucket
              |  WHERE q.vec_id < 8 AND c.vec_id >= 8),
              |annscored AS (
              |  SELECT cand.q_id, cand.vec_id, ${sqlCos("eq", "ec")} AS cos_sim
              |  FROM cand
              |  JOIN embeddings eq ON cand.q_id = eq.vec_id
              |  JOIN embeddings ec ON cand.vec_id = ec.vec_id),
              |ann AS (
              |  SELECT q_id, vec_id FROM annscored
              |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) <= 5),
              |exscored AS (
              |  SELECT q.vec_id AS q_id, e.vec_id,
              |         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
              |  FROM embeddings q CROSS JOIN embeddings e
              |  WHERE q.vec_id < 8 AND e.vec_id >= 8),
              |ex AS (
              |  SELECT q_id, vec_id FROM exscored
              |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) <= 5)
              |SELECT ex.q_id, COUNT(*) AS n_exact,
              |       CAST(SUM(CASE WHEN ann.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
              |       CAST(SUM(CASE WHEN ann.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
              |         / COUNT(*) AS recall
              |FROM ex LEFT JOIN ann ON ex.q_id = ann.q_id AND ex.vec_id = ann.vec_id
              |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin)),

    // ── product-quantization encode, hash-checked end to end: 16 subspaces
    //    × 16-code books trained by the fixed-point Lloyd update at
    //    subvector grain (one fused explode+agg job for all books), then a
    //    map-side literal-argmax projection to 16 small codes per vector.
    //    The DuckDB twin re-trains every book from its own slices
    //    (sqlPqBooks), so a wrong seed, mean bit, slice boundary, or
    //    tie-break anywhere in the PQ machinery shifts the hash. Global
    //    range sort, not orderedReport — one row per corpus vector (the
    //    ivf_assign convention). Config = pqTopK's measured defaults
    //    (PqProbe sweep in the scaladoc).
    ("pq_codes",
      (spark, dir) => {
        val corpus = Tables.embeddings(spark, dir).filter(col("vec_id") >= 8)
        val books = Similarity.pqCodebooks(corpus, m = pqM, k = 16, iters = 1)
        Similarity.pqEncode(corpus, books).orderBy(col("vec_id"))
      },
      Some(s"""WITH ${sqlPqBooks("vec_id >= 8", pqM, 16, 1, 64)}
              |SELECT vec_id, ${(0 until pqM).map(s => s"e$s.code AS c$s").mkString(", ")}
              |FROM pq0enc e0
              |${(1 until pqM).map(s => s"JOIN pq${s}enc e$s USING (vec_id)").mkString(" ")}
              |ORDER BY vec_id""".stripMargin)),

    // ── PQ asymmetric-distance top-k: full-precision queries against the
    //    16-code corpus, score = cosine(query, reconstruction) assembled from
    //    per-(subspace, code) lookup tables — rounded subvector dots +
    //    rounded codeword norm² — computed driver-side and shipped as plan
    //    literals. The twin recomputes books, codes, AND tables relationally
    //    and combines them with the same association order (left-fold sums,
    //    dot/(qn·sqrt(n2)), final round 6), so the hash pins the entire ADC
    //    surface including the driver-side rounding twin
    //    (roundedLocal/dotLocal ≡ round(list_inner_product, 6)).
    ("pq_ann_topk",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.pqTopK(emb.filter(col("vec_id") < 8),
                          emb.filter(col("vec_id") >= 8), 5,
                          m = pqM, codesPerBook = 16, iters = 1)
          .transform(CatalogCore.orderedReport(_,
            col("q_id"), col("adc_score").desc, col("vec_id")))
      },
      Some(s"""WITH $sqlPqScoredCtes
              |SELECT q_id, vec_id, adc_score FROM scored
              |QUALIFY row_number() OVER (PARTITION BY q_id
              |          ORDER BY adc_score DESC, vec_id) <= 5
              |ORDER BY q_id, adc_score DESC, vec_id""".stripMargin)),

    // ── IVF-probed ANN top-k, hash-checked end to end (closing the IVF
    //    family the way pq_ann_topk closed PQ): fixed-point k-means
    //    centroids → corpus argmax assignment (the inverted file) → each
    //    query probes its 4 nearest centroids and exact-rescores ONLY those
    //    lists — a query touches nProbe/nCentroids of the corpus. The twin
    //    rebuilds clustering, both assignments, and the probe join
    //    relationally, so centroids, probe choice, and every rescore are
    //    all under the driver's hash.
    ("ivf_ann_topk",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.ivfTopK(emb.filter(col("vec_id") < 8),
                           emb.filter(col("vec_id") >= 8), 5,
                           nCentroids = 16, nProbe = 4, iters = 1)
          .transform(CatalogCore.orderedReport(_,
            col("q_id"), col("cos_sim").desc, col("vec_id")))
      },
      Some(s"""WITH ${sqlKmeans("vec_id >= 8", 16, 1)},
              |casg AS (
              |  SELECT vec_id, cluster_id, emb FROM (
              |    SELECT c.vec_id, kk.cluster_id, c.emb,
              |           row_number() OVER (PARTITION BY c.vec_id
              |             ORDER BY round(list_cosine_similarity(c.emb, kk.centroid), 6) DESC,
              |                      kk.cluster_id) AS rn
              |    FROM corpus c CROSS JOIN cent1 kk) WHERE rn = 1),
              |q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS emb
              |      FROM embeddings WHERE vec_id < 8),
              |qprobe AS (
              |  SELECT q_id, emb, cluster_id FROM (
              |    SELECT q.q_id, q.emb, kk.cluster_id,
              |           row_number() OVER (PARTITION BY q.q_id
              |             ORDER BY round(list_cosine_similarity(q.emb, kk.centroid), 6) DESC,
              |                      kk.cluster_id) AS rn
              |    FROM q CROSS JOIN cent1 kk) WHERE rn <= 4),
              |scored AS (
              |  SELECT p.q_id, a.vec_id,
              |         round(list_cosine_similarity(p.emb, a.emb), 6) AS cos_sim
              |  FROM qprobe p JOIN casg a USING (cluster_id))
              |SELECT q_id, vec_id, cos_sim FROM scored
              |QUALIFY row_number() OVER (PARTITION BY q_id
              |          ORDER BY cos_sim DESC, vec_id) <= 5
              |ORDER BY q_id, cos_sim DESC, vec_id""".stripMargin)),

    // ── ANN INDEX LIFECYCLE (Similarity.saveIvfIndex / loadIvfIndex /
    //    ivfTopKWithIndex): the index is TRAINED, PERSISTED to parquet
    //    (centroids + config fingerprint), LOADED back — fingerprint-
    //    validated — and the search runs against the LOADED index, the
    //    production serving shape where training and serving are separate
    //    jobs. Float lanes roundtrip parquet bit-identically (load ≡ build
    //    is spec-pinned in SimilaritySpec), so the twin is the same
    //    relational k-means + probe rebuild as ivf_ann_topk — any
    //    divergence in save, load, or fingerprinting shifts the hash.
    //    Config differs from ivf_ann_topk (k=3, nProbe=2) so the two rows
    //    pin different rankings. Roundtrip write + k-means chain ⇒ listed
    //    in Bench's jobchain itemization with the rest of the IVF family.
    ("ivf_index_search",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        val corpus = emb.filter(col("vec_id") >= 8)
        val path = CatalogCore.scratchDir("graft_ivf_idx_")
        Similarity.saveIvfIndex(spark, path, corpus, nCentroids = 16, iters = 1)
        val cents = Similarity.loadIvfIndex(spark, path, nCentroids = 16, iters = 1)
        Similarity.ivfTopKWithIndex(emb.filter(col("vec_id") < 8), corpus,
                                    k = 3, nProbe = 2, cents)
          .transform(CatalogCore.orderedReport(_,
            col("q_id"), col("cos_sim").desc, col("vec_id")))
      },
      Some(s"""WITH ${sqlKmeans("vec_id >= 8", 16, 1)},
              |casg AS (
              |  SELECT vec_id, cluster_id, emb FROM (
              |    SELECT c.vec_id, kk.cluster_id, c.emb,
              |           row_number() OVER (PARTITION BY c.vec_id
              |             ORDER BY round(list_cosine_similarity(c.emb, kk.centroid), 6) DESC,
              |                      kk.cluster_id) AS rn
              |    FROM corpus c CROSS JOIN cent1 kk) WHERE rn = 1),
              |q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS emb
              |      FROM embeddings WHERE vec_id < 8),
              |qprobe AS (
              |  SELECT q_id, emb, cluster_id FROM (
              |    SELECT q.q_id, q.emb, kk.cluster_id,
              |           row_number() OVER (PARTITION BY q.q_id
              |             ORDER BY round(list_cosine_similarity(q.emb, kk.centroid), 6) DESC,
              |                      kk.cluster_id) AS rn
              |    FROM q CROSS JOIN cent1 kk) WHERE rn <= 2),
              |scored AS (
              |  SELECT p.q_id, a.vec_id,
              |         round(list_cosine_similarity(p.emb, a.emb), 6) AS cos_sim
              |  FROM qprobe p JOIN casg a USING (cluster_id))
              |SELECT q_id, vec_id, cos_sim FROM scored
              |QUALIFY row_number() OVER (PARTITION BY q_id
              |          ORDER BY cos_sim DESC, vec_id) <= 3
              |ORDER BY q_id, cos_sim DESC, vec_id""".stripMargin)),

    // ── HYBRID RRF RETRIEVAL (Similarity.hybridRrfSearch): exact-cosine
    //    vector top-20 and distinct-token lexical-overlap top-20 fused per
    //    query by reciprocal rank Σ 1/(60+r) — the calibration-free hybrid
    //    search a RAG stack serves. Both ranks are total-ordered, counts
    //    exact, one fixed double association rounded at 6, so the fused
    //    report hash-matches the relational twin (both rankings + FULL
    //    JOIN fusion rebuilt in SQL).
    ("hybrid_rrf_search",
      (spark, dir) =>
        Similarity.hybridRrfSearch(Tables.documents(spark, dir),
                                   Tables.embeddings(spark, dir), qMax = 8)
          .transform(CatalogCore.orderedReport(_,
            col("q_id"), col("rrf_score").desc, col("doc_id"))),
      Some("""WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS emb
             |           FROM embeddings WHERE vec_id < 8),
             |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
             |      FROM embeddings WHERE vec_id >= 8),
             |vr AS (SELECT q_id, vec_id AS doc_id,
             |              CAST(row_number() OVER (PARTITION BY q_id
             |                ORDER BY round(list_cosine_similarity(q.emb, c.emb), 6) DESC,
             |                         vec_id) AS BIGINT) AS r_vec
             |       FROM q CROSS JOIN c
             |       QUALIFY r_vec <= 20),
             |qt AS (SELECT DISTINCT doc_id AS q_id, tok FROM (
             |         SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |         FROM documents WHERE doc_id < 8)),
             |ct AS (SELECT DISTINCT doc_id, tok FROM (
             |         SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |         FROM documents WHERE doc_id >= 8)),
             |sh AS (SELECT qt.q_id, ct.doc_id, CAST(COUNT(*) AS BIGINT) AS shared
             |       FROM ct JOIN qt USING (tok) GROUP BY 1, 2),
             |tr AS (SELECT q_id, doc_id,
             |              CAST(row_number() OVER (PARTITION BY q_id
             |                ORDER BY shared DESC, doc_id) AS BIGINT) AS r_text
             |       FROM sh QUALIFY r_text <= 20),
             |f AS (SELECT COALESCE(vr.q_id, tr.q_id) AS q_id,
             |             COALESCE(vr.doc_id, tr.doc_id) AS doc_id,
             |             vr.r_vec, tr.r_text
             |      FROM vr FULL JOIN tr
             |        ON vr.q_id = tr.q_id AND vr.doc_id = tr.doc_id)
             |SELECT q_id, doc_id, r_vec, r_text,
             |       round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_vec), 0)
             |             + COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_text), 0), 6) AS rrf_score
             |FROM f
             |QUALIFY row_number() OVER (PARTITION BY q_id
             |          ORDER BY rrf_score DESC, doc_id) <= 10
             |ORDER BY q_id, rrf_score DESC, doc_id""".stripMargin)),

    // ── IVF approximation quality as a driver-hashed number (the
    //    ann_recall/pq_recall convention): per-query recall of the probed
    //    top-k against the exact brute-force top-k — a centroid, probe, or
    //    assignment regression changes this row even if ivf_ann_topk stays
    //    self-consistent.
    ("ivf_recall",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.ivfRecall(emb.filter(col("vec_id") < 8),
                             emb.filter(col("vec_id") >= 8), 5,
                             nCentroids = 16, nProbe = 4, iters = 1)
          .transform(CatalogCore.orderedReport(_, col("q_id")))
      },
      Some(s"""WITH ${sqlKmeans("vec_id >= 8", 16, 1)},
              |casg AS (
              |  SELECT vec_id, cluster_id, emb FROM (
              |    SELECT c.vec_id, kk.cluster_id, c.emb,
              |           row_number() OVER (PARTITION BY c.vec_id
              |             ORDER BY round(list_cosine_similarity(c.emb, kk.centroid), 6) DESC,
              |                      kk.cluster_id) AS rn
              |    FROM corpus c CROSS JOIN cent1 kk) WHERE rn = 1),
              |q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS emb
              |      FROM embeddings WHERE vec_id < 8),
              |qprobe AS (
              |  SELECT q_id, emb, cluster_id FROM (
              |    SELECT q.q_id, q.emb, kk.cluster_id,
              |           row_number() OVER (PARTITION BY q.q_id
              |             ORDER BY round(list_cosine_similarity(q.emb, kk.centroid), 6) DESC,
              |                      kk.cluster_id) AS rn
              |    FROM q CROSS JOIN cent1 kk) WHERE rn <= 4),
              |ivftop AS (
              |  SELECT p.q_id, a.vec_id
              |  FROM qprobe p JOIN casg a USING (cluster_id)
              |  QUALIFY row_number() OVER (PARTITION BY p.q_id
              |            ORDER BY round(list_cosine_similarity(p.emb, a.emb), 6) DESC,
              |                     a.vec_id) <= 5),
              |exscored AS (
              |  SELECT qq.vec_id AS q_id, e.vec_id,
              |         round(list_cosine_similarity(CAST(qq.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
              |  FROM embeddings qq CROSS JOIN embeddings e
              |  WHERE qq.vec_id < 8 AND e.vec_id >= 8),
              |ex AS (
              |  SELECT q_id, vec_id FROM exscored
              |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) <= 5)
              |SELECT ex.q_id, COUNT(*) AS n_exact,
              |       CAST(SUM(CASE WHEN ivftop.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
              |       CAST(SUM(CASE WHEN ivftop.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
              |         / COUNT(*) AS recall
              |FROM ex LEFT JOIN ivftop ON ex.q_id = ivftop.q_id AND ex.vec_id = ivftop.vec_id
              |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin)),

    // ── PQ approximation quality as a driver-hashed number: per-query
    //    recall of the ADC top-k against the exact brute-force top-k — the
    //    ann_recall convention applied to the PQ surface, so a codebook,
    //    encode, or table regression changes this row even if pq_ann_topk
    //    stays self-consistent.
    ("pq_recall",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.pqRecall(emb.filter(col("vec_id") < 8),
                            emb.filter(col("vec_id") >= 8), 5,
                            m = pqM, codesPerBook = 16, iters = 1)
          .transform(CatalogCore.orderedReport(_, col("q_id")))
      },
      Some(s"""WITH $sqlPqScoredCtes,
              |pqtop AS (
              |  SELECT q_id, vec_id FROM scored
              |  QUALIFY row_number() OVER (PARTITION BY q_id
              |            ORDER BY adc_score DESC, vec_id) <= 5),
              |exscored AS (
              |  SELECT qq.vec_id AS q_id, e.vec_id,
              |         round(list_cosine_similarity(CAST(qq.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
              |  FROM embeddings qq CROSS JOIN embeddings e
              |  WHERE qq.vec_id < 8 AND e.vec_id >= 8),
              |ex AS (
              |  SELECT q_id, vec_id FROM exscored
              |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) <= 5)
              |SELECT ex.q_id, COUNT(*) AS n_exact,
              |       CAST(SUM(CASE WHEN pqtop.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
              |       CAST(SUM(CASE WHEN pqtop.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
              |         / COUNT(*) AS recall
              |FROM ex LEFT JOIN pqtop ON ex.q_id = pqtop.q_id AND ex.vec_id = pqtop.vec_id
              |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin)),

    // ── IVFPQ composed ANN (coarse-quantizer pruning + PQ ADC scoring —
    //    the FAISS-style inverted-file deployment shape): each query scores
    //    only the corpus vectors in its 4 probed clusters, and the score is
    //    the PQ reconstruction cosine. Twin = the ivf_ann_topk clustering/
    //    probe CTEs composed with the pq_ann_topk scored CTEs, restricted
    //    to probed candidates — no new arithmetic on either side.
    ("ivfpq_ann_topk",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.ivfpqTopK(emb.filter(col("vec_id") < 8),
                             emb.filter(col("vec_id") >= 8), 5,
                             nCentroids = 16, nProbe = 4,
                             m = pqM, codesPerBook = 16, iters = 1)
          .transform(CatalogCore.orderedReport(_,
            col("q_id"), col("adc_score").desc, col("vec_id")))
      },
      Some(s"""WITH ${sqlKmeans("vec_id >= 8", 16, 1)},
              |casg AS (
              |  SELECT vec_id, cluster_id FROM (
              |    SELECT c.vec_id, kk.cluster_id,
              |           row_number() OVER (PARTITION BY c.vec_id
              |             ORDER BY round(list_cosine_similarity(c.emb, kk.centroid), 6) DESC,
              |                      kk.cluster_id) AS rn
              |    FROM corpus c CROSS JOIN cent1 kk) WHERE rn = 1),
              |$sqlPqScoredCtes,
              |qprobe AS (
              |  SELECT q_id, cluster_id FROM (
              |    SELECT q.q_id, kk.cluster_id,
              |           row_number() OVER (PARTITION BY q.q_id
              |             ORDER BY round(list_cosine_similarity(q.emb, kk.centroid), 6) DESC,
              |                      kk.cluster_id) AS rn
              |    FROM q CROSS JOIN cent1 kk) WHERE rn <= 4),
              |cand AS (
              |  SELECT p.q_id, a.vec_id FROM qprobe p JOIN casg a USING (cluster_id))
              |SELECT s.q_id, s.vec_id, s.adc_score
              |FROM scored s JOIN cand USING (q_id, vec_id)
              |QUALIFY row_number() OVER (PARTITION BY s.q_id
              |          ORDER BY s.adc_score DESC, s.vec_id) <= 5
              |ORDER BY s.q_id, s.adc_score DESC, s.vec_id""".stripMargin)),

    // ── IVFPQ approximation quality (the ann_recall convention): per-query
    //    recall of the pruned+quantized top-k vs exact brute force — the
    //    composed index's end-to-end quality number, sensitive to coarse
    //    clustering, probe choice, codebooks, and tables at once.
    ("ivfpq_recall",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.ivfpqRecall(emb.filter(col("vec_id") < 8),
                               emb.filter(col("vec_id") >= 8), 5,
                               nCentroids = 16, nProbe = 4,
                               m = pqM, codesPerBook = 16, iters = 1)
          .transform(CatalogCore.orderedReport(_, col("q_id")))
      },
      Some(s"""WITH ${sqlKmeans("vec_id >= 8", 16, 1)},
              |casg AS (
              |  SELECT vec_id, cluster_id FROM (
              |    SELECT c.vec_id, kk.cluster_id,
              |           row_number() OVER (PARTITION BY c.vec_id
              |             ORDER BY round(list_cosine_similarity(c.emb, kk.centroid), 6) DESC,
              |                      kk.cluster_id) AS rn
              |    FROM corpus c CROSS JOIN cent1 kk) WHERE rn = 1),
              |$sqlPqScoredCtes,
              |qprobe AS (
              |  SELECT q_id, cluster_id FROM (
              |    SELECT q.q_id, kk.cluster_id,
              |           row_number() OVER (PARTITION BY q.q_id
              |             ORDER BY round(list_cosine_similarity(q.emb, kk.centroid), 6) DESC,
              |                      kk.cluster_id) AS rn
              |    FROM q CROSS JOIN cent1 kk) WHERE rn <= 4),
              |cand AS (
              |  SELECT p.q_id, a.vec_id FROM qprobe p JOIN casg a USING (cluster_id)),
              |ivfpqtop AS (
              |  SELECT s.q_id, s.vec_id
              |  FROM scored s JOIN cand USING (q_id, vec_id)
              |  QUALIFY row_number() OVER (PARTITION BY s.q_id
              |            ORDER BY s.adc_score DESC, s.vec_id) <= 5),
              |exscored AS (
              |  SELECT qq.vec_id AS q_id, e.vec_id,
              |         round(list_cosine_similarity(CAST(qq.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
              |  FROM embeddings qq CROSS JOIN embeddings e
              |  WHERE qq.vec_id < 8 AND e.vec_id >= 8),
              |ex AS (
              |  SELECT q_id, vec_id FROM exscored
              |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) <= 5)
              |SELECT ex.q_id, COUNT(*) AS n_exact,
              |       CAST(SUM(CASE WHEN ivfpqtop.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
              |       CAST(SUM(CASE WHEN ivfpqtop.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
              |         / COUNT(*) AS recall
              |FROM ex LEFT JOIN ivfpqtop ON ex.q_id = ivfpqtop.q_id AND ex.vec_id = ivfpqtop.vec_id
              |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin)),

    // ── language-ID heuristic (stopword-hit ratio).
    ("lang_id",
      (spark, dir) => {
        val (ratio, predicted) = TextAnalysis.langId(col("text"))
        Tables.spread(Tables.documents(spark, dir), col("doc_id"))
          .select(col("doc_id"), col("lang"),
                  ratio.as("en_ratio"), predicted.as("predicted"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, lang,
              |       CAST(len(list_filter($sqlTokens, t -> list_contains($stopListSql, t))) AS DOUBLE)
              |             / len($sqlTokens) AS en_ratio,
              |       CASE WHEN CAST(len(list_filter($sqlTokens, t -> list_contains($stopListSql, t))) AS DOUBLE)
              |                 / len($sqlTokens) >= 0.04
              |            THEN 'en' ELSE 'und' END AS predicted
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── quality scoring (length / distinct / stopword components).
    // ── Gopher-style repetition metrics: duplicate-token / duplicate-bigram
    //    fractions and the top-bigram share — exact integer-count ratios
    //    (one double division each, engine-portable, no rounding).
    ("repetition_scores",
      (spark, dir) =>
        TextAnalysis.repetitionScores(Tables.documents(spark, dir))
          .orderBy(col("doc_id")),
      Some(s"""WITH t1 AS (SELECT doc_id, unnest(${sqlShingles(1)}) AS g FROM documents),
              |c1 AS (SELECT doc_id, g, COUNT(*) AS c FROM t1 GROUP BY 1, 2),
              |s1 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total, COUNT(*) AS dist
              |       FROM c1 GROUP BY 1),
              |t2 AS (SELECT doc_id, unnest(${sqlShingles(2)}) AS g FROM documents),
              |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM t2 GROUP BY 1, 2),
              |s2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total, COUNT(*) AS dist, MAX(c) AS top
              |       FROM c2 GROUP BY 1)
              |SELECT s1.doc_id, s1.total AS n_tokens,
              |       1.0 - CAST(s1.dist AS DOUBLE) / s1.total AS dup_token_frac,
              |       1.0 - CAST(s2.dist AS DOUBLE) / s2.total AS dup_2gram_frac,
              |       CAST(s2.top AS DOUBLE) / s2.total AS top_2gram_frac
              |FROM s1 JOIN s2 ON s1.doc_id = s2.doc_id ORDER BY s1.doc_id""".stripMargin)),

    ("quality_scores",
      (spark, dir) => {
        val q = TextAnalysis.qualityColumns(col("text"))
        Tables.spread(Tables.documents(spark, dir), col("doc_id"))
          .select(col("doc_id"), q("n_tokens").cast("long").as("n_tokens"),
                  q("n_distinct").cast("long").as("n_distinct"),
                  q("avg_token_len").as("avg_token_len"),
                  q("stopword_ratio").as("stopword_ratio"),
                  q("quality_score").as("quality_score"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH f AS (
              |  SELECT doc_id,
              |         len($sqlTokens) AS n_tokens,
              |         len(list_distinct($sqlTokens)) AS n_distinct,
              |         length(replace(text, ' ', '')) AS n_chars,
              |         len(list_filter($sqlTokens, t -> list_contains($stopListSql, t))) AS stop_hits
              |  FROM documents)
              |SELECT doc_id, n_tokens, n_distinct,
              |       CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len,
              |       CAST(stop_hits AS DOUBLE) / n_tokens AS stopword_ratio,
              |       least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
              |             + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3
              |             + least((CAST(stop_hits AS DOUBLE) / n_tokens) * 5.0, 1.0) * 0.3 AS quality_score
              |FROM f ORDER BY doc_id""".stripMargin)),

    // ── token counting: whitespace + BPE-ish regex segmentation.
    ("token_counts",
      (spark, dir) => {
        val (ws, bpe) = TextAnalysis.tokenCounts(col("text"))
        Tables.spread(Tables.documents(spark, dir), col("doc_id"))
          // long, matching DuckDB's BIGINT len()/length()
          .select(col("doc_id"), ws.cast("long").as("ws_tokens"),
                  bpe.cast("long").as("bpe_tokens"),
                  length(col("text")).cast("long").as("n_chars_total"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |       len($sqlTokens) AS ws_tokens,
              |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens,
              |       length(text) AS n_chars_total
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── document fingerprints: min/max md5 over 5-gram shingles.
    ("doc_fingerprints",
      (spark, dir) =>
        TextAnalysis.fingerprintTable(Tables.documents(spark, dir))
          .orderBy(col("doc_id")),
      Some(s"""WITH sh AS (SELECT doc_id, list_transform(${sqlShingles(5)}, g -> md5(g)) AS hs FROM documents)
              |SELECT doc_id, len(hs) AS n_shingles,
              |       list_min(hs) AS fp_min, list_max(hs) AS fp_max
              |FROM sh ORDER BY doc_id""".stripMargin)),

    // ── UDTF analogue: explode to tokens, global top-20 token frequencies.
    ("top_tokens",
      (spark, dir) =>
        TextAnalysis.explodeTokens(Tables.documents(spark, dir))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20),
      Some("""SELECT token, COUNT(*) AS n
             |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
             |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin)),

    // ── TF-IDF term weights (tf ≥ 3): the tf-idf-style aggregate surface
    //    from SURVEY §7.2 step 7; ln() agrees across engines to ~1 ulp,
    //    absorbed by round(…, 6).
    ("tfidf_terms",
      (spark, dir) => {
        val docs = Tables.documents(spark, dir)
        // tf is referenced twice (join probe side + dfreq), so the explode +
        // (doc, token) aggregate subtree executes once per consumer — and
        // that recompute is the MEASURED-best form here (5-rep A/B at sf0.1,
        // one session): recompute 0.45-0.55 s vs localCheckpoint 0.98-1.0 s
        // vs lazy persist 0.70 s vs spread+checkpoint (the prior shape)
        // 0.98-2.3 s. Both materialization forms cost more than re-running
        // the cheap codegen'd explode+partial-agg; the spread's parallelism
        // rescue also loses (its .rdd probe + range exchange outweigh the
        // serial explode at this corpus size, and at cluster scale the scan
        // has >=cores splits so spread is a no-op anyway). At 100 TB the tf
        // relation is the persisted/bucketed intermediate table instead
        // (SCALE.md "Checkpoint only what re-executes expensively").
        val tf = TextAnalysis.explodeTokens(docs)
          .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        tf.join(dfreq, Seq("token")).crossJoin(n)
          .filter(col("tf") >= 3)
          .select(col("doc_id"), col("token"), col("tf"), col("df"),
                  round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
                    .as("tfidf"))
          .orderBy(col("doc_id"), col("token"))
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
             |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
             |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT COUNT(*) AS n_docs FROM documents)
             |SELECT t.doc_id, t.token, t.tf, d.df,
             |       round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS tfidf
             |FROM tf t JOIN dfreq d USING (token) CROSS JOIN n
             |WHERE t.tf >= 3
             |ORDER BY t.doc_id, t.token""".stripMargin)),

    // ── multimodal metadata over the opaque binary payload — pure column
    //    expressions, no decode (see [[graft.ops.Multimodal]]).
    ("multimodal_meta",
      (spark, dir) =>
        Multimodal.metadata(Multimodal.toMedia(Tables.documents(spark, dir)))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             |       sha256(text) AS sha256
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── REAL text-payload decode, driver-hashed (replaces the retired
    //    round-6 decodeStub): wrap documents as binary media, strict-UTF-8
    //    decode in batched mapPartitions, reduce to the integer-exact 8-lane
    //    profile. The twin recomputes every lane from the source text with
    //    regexp/list functions, so a decode bug, a wrong char class, or a
    //    tokenizer drift shifts the hash. Lanes surface as BIGINTs (counts
    //    are exact in the Float lanes below 2^24 by construction).
    ("multimodal_text_features",
      (spark, dir) => {
        val lanes = Seq("n_chars", "n_letters", "n_digits", "n_ws",
                        "n_other", "n_tokens", "max_token_len", "n_lines")
        Multimodal.extractFeatures(spark,
            Multimodal.toMedia(Tables.spread(Tables.documents(spark, dir), col("doc_id"))))
          .toDF()
          .select(col("doc_id") +: col("n_bytes").cast("long").as("n_bytes") +:
                  col("sha256") +:
                  lanes.zipWithIndex.map { case (n, i) =>
                    element_at(col("feature"), i + 1).cast("long").as(n)
                  }: _*)
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id, text,
             |         octet_length(encode(text)) AS n_bytes,
             |         sha256(text) AS sha256,
             |         length(text) AS n_chars,
             |         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_letters,
             |         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
             |         length(regexp_replace(text, '[^ \t\n\r]', '', 'g')) AS n_ws,
             |         list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
             |  FROM documents)
             |SELECT doc_id, n_bytes, sha256,
             |       CAST(n_chars AS BIGINT) AS n_chars,
             |       CAST(n_letters AS BIGINT) AS n_letters,
             |       CAST(n_digits AS BIGINT) AS n_digits,
             |       CAST(n_ws AS BIGINT) AS n_ws,
             |       CAST(n_chars - n_letters - n_digits - n_ws AS BIGINT) AS n_other,
             |       CAST(len(toks) AS BIGINT) AS n_tokens,
             |       CAST(COALESCE(list_max(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS max_token_len,
             |       CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS BIGINT) AS n_lines
             |FROM f ORDER BY doc_id""".stripMargin)),

    // ── REAL multimodal decode, hash-checked through actual bytes: pack the
    //    embeddings as GRFT binary media (header + int32 fixed-point
    //    samples), decode the payloads in batched mapPartitions, reduce to
    //    integer-exact features. The oracle computes the same numbers from
    //    the numeric source column — any bug in the byte layout, header
    //    handling, or sample extraction shifts the hash. (Replaces round 4's
    //    decode *stub* as the driver-visible decode surface; the stub
    //    remains only for free-form text payloads.)
    ("multimodal_features",
      (spark, dir) =>
        Multimodal.mediaFeatures(spark,
            Multimodal.encodeEmbeddings(spark, Tables.embeddings(spark, dir)))
          .toDF().orderBy(col("vec_id")),
      Some("""WITH s AS (
             |  SELECT vec_id,
             |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS fp
             |  FROM embeddings WHERE embedding IS NOT NULL)
             |SELECT vec_id, COUNT(*) AS n_samples,
             |       CAST(SUM(fp) AS BIGINT) AS sum_fp,
             |       CAST(MAX(ABS(fp)) AS BIGINT) AS peak_fp,
             |       CAST(SUM(fp * fp) AS BIGINT) AS energy_fp
             |FROM s GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // ── frame sampling over the GRFT decode (Multimodal.frameSample — the
    //    video-keyframe plumbing): every 2nd 8-sample frame of each decoded
    //    payload, integer-exact per-frame stats, map-side explode inside the
    //    partition. The twin recomputes from the source embeddings with the
    //    same frame/stride arithmetic.
    ("multimodal_framesample",
      (spark, dir) =>
        Multimodal.frameSample(spark,
            Multimodal.encodeEmbeddings(spark, Tables.embeddings(spark, dir)))
          .toDF().orderBy(col("vec_id"), col("frame_no")),
      Some("""WITH s AS (
             |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS fp
             |  FROM embeddings WHERE embedding IS NOT NULL),
             |f AS (SELECT vec_id, i // 8 AS frame_no, fp FROM s WHERE (i // 8) % 2 = 0)
             |SELECT vec_id, frame_no, COUNT(*) AS n_samples,
             |       CAST(SUM(fp) AS BIGINT) AS sum_fp,
             |       CAST(MAX(ABS(fp)) AS BIGINT) AS peak_fp
             |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── deterministic train/val/test split manifest: hash-of-key assignment
    //    (stable under reruns/repartitioning/corpus growth — randomSplit is
    //    neither), summarized per (split, source).
    ("split_manifest",
      (spark, dir) =>
        Tables.documents(spark, dir)
          .select(Curation.assignSplit(col("doc_id")).as("split"),
                  col("source"), col("n_chars"))
          .groupBy(col("split"), col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
          .transform(CatalogCore.orderedReport(_, col("split"), col("source"))),
      Some(s"""SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
              |       source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
              |FROM (SELECT source, n_chars, $sqlHashBucket100 AS b FROM documents)
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── sequence-packing manifest (concat-and-chunk into 2048-token
    //    sequences, packed independently per source shard).
    ("pack_sequences",
      (spark, dir) =>
        Curation.packingManifest(Tables.documents(spark, dir), budget = 2048)
          .orderBy(col("shard"), col("seq_id")),
      Some(s"""WITH t AS (
              |  SELECT source AS shard, doc_id, len($sqlTokens) AS n_tokens FROM documents),
              |o AS (
              |  SELECT shard, n_tokens,
              |         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
              |  FROM t)
              |SELECT shard, CAST(floor(CAST(start_off AS DOUBLE) / 2048) AS BIGINT) AS seq_id,
              |       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
              |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── materialized packed sequences: the actual training-file payload —
    //    member docs concatenated in packing order per (shard, seq).
    ("packed_text",
      (spark, dir) =>
        Curation.packedText(Tables.documents(spark, dir), budget = 2048)
          .orderBy(col("shard"), col("seq_id")),
      Some(s"""WITH t AS (
              |  SELECT source AS shard, doc_id, text, len($sqlTokens) AS n_tokens FROM documents),
              |o AS (
              |  SELECT shard, doc_id, text,
              |         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
              |  FROM t)
              |SELECT shard, CAST(floor(CAST(start_off AS DOUBLE) / 2048) AS BIGINT) AS seq_id,
              |       COUNT(*) AS n_docs, string_agg(text, ' ' ORDER BY doc_id) AS seq_text
              |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── deterministic stratified sample: k smallest-hash docs per language
    //    (partial-agg top-k — no per-stratum ranking window).
    ("stratified_sample",
      (spark, dir) =>
        Curation.stratifiedSample(Tables.documents(spark, dir), 10)
          .orderBy(col("lang"), col("doc_id")),
      Some(s"""SELECT lang, doc_id FROM documents
              |QUALIFY row_number() OVER (
              |  PARTITION BY lang
              |  ORDER BY CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS UBIGINT) AS BIGINT),
              |           doc_id) <= 10
              |ORDER BY lang, doc_id""".stripMargin)),

    // ── mixture rebalancing: language-balanced deterministic downsample —
    //    per-language keep-rates from two tiny aggregates, then a map-side
    //    hash-threshold filter; summarized per language.
    ("lang_balanced_sample",
      (spark, dir) => {
        // report form of Curation.balancedSample (the row-level API,
        // CurationSpec). keep_per_10k comes from the RATES relation, not
        // from the surviving rows — a group that keeps zero docs by hash
        // chance must still report its true threshold (as the oracle's
        // `thr` CTE does). The rates relation is referenced exactly ONCE
        // (broadcast into the corpus pass) and n_kept is a conditional sum
        // in the same aggregate — every doc of every group flows in, so
        // zero-kept groups survive without a second rates reference and
        // the left-join + coalesce it needed (each extra reference of a
        // derived relation is a re-execution or a checkpoint barrier).
        val docs = Tables.documents(spark, dir).select(col("lang"), col("doc_id"))
        val rates = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
          .withColumn("min_n",
            min(col("n_docs")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
          .select(col("lang"), col("n_docs"),
                  floor(col("min_n").cast("double") * 10000 / col("n_docs"))
                    .cast("long").as("keep_per_10k"))
        docs.join(broadcast(rates), Seq("lang"))
          .groupBy(col("lang"))
          .agg(min(col("n_docs")).as("n_docs"),
               min(col("keep_per_10k")).as("keep_per_10k"),
               sum(when(Curation.hashBucket(col("doc_id"), 10000) < col("keep_per_10k"),
                        1L).otherwise(0L)).as("n_kept"))
          .transform(CatalogCore.orderedReport(_, col("lang")))
      },
      Some(s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
              |m AS (SELECT MIN(n) AS min_n FROM c),
              |thr AS (SELECT lang, n,
              |               CAST(floor(CAST(min_n AS DOUBLE) * 10000 / n) AS BIGINT) AS keep_per_10k
              |        FROM c CROSS JOIN m),
              |k AS (SELECT d.lang, COUNT(*) AS n_kept
              |      FROM documents d JOIN thr USING (lang)
              |      WHERE ${sqlHashBucket("d.doc_id", 10000)} < thr.keep_per_10k
              |      GROUP BY 1)
              |SELECT t.lang, t.n AS n_docs, t.keep_per_10k, COALESCE(k.n_kept, 0) AS n_kept
              |FROM thr t LEFT JOIN k USING (lang) ORDER BY t.lang""".stripMargin)),

    // ── general weighted mixture: downsample toward target proportions
    //    (en-heavy mix) without upsampling; the binding group keeps
    //    everything. Report form of Curation.weightedSample — same shape as
    //    lang_balanced_sample, with the oracle rebuilding the feasible-scale
    //    (`s = min n/w`) and the binding-group exact-`mod` rule.
    // ── temperature-scaled mixture computation (the p^α sampling rule of
    //    multilingual/multi-domain pretraining): the upstream step that
    //    PRODUCES the mixture weighted_mixture_sample consumes. Integer
    //    micro-weights make the normalization denominator an exact BIGINT
    //    sum and absorb cross-engine pow() ulps; the twin recomputes the
    //    whole report relationally.
    // ── mixture crosstab via relational PIVOT (the one §2-adjacent
    //    operator shape not yet exercised): token totals per source,
    //    pivoted by language into columns. The value list is EXPLICIT —
    //    `pivot(col, values)` plans as one aggregate; the values-less
    //    overload runs a distinct-scan job first and would embed a
    //    corpus-dependent column set (wrong at any scale, racy under
    //    growth). Empty cells coalesce to 0 on both engines.
    ("source_lang_pivot",
      (spark, dir) =>
        Tables.documents(spark, dir)
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
          .groupBy(col("source"))
          .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
          .agg(sum(col("n_tokens")))
          .na.fill(0L)
          .transform(CatalogCore.orderedReport(_, col("source"))),
      Some(s"""SELECT source,
              |       CAST(COALESCE(SUM(CASE WHEN lang = 'de' THEN len($sqlTokens) END), 0) AS BIGINT) AS de,
              |       CAST(COALESCE(SUM(CASE WHEN lang = 'en' THEN len($sqlTokens) END), 0) AS BIGINT) AS en,
              |       CAST(COALESCE(SUM(CASE WHEN lang = 'es' THEN len($sqlTokens) END), 0) AS BIGINT) AS es,
              |       CAST(COALESCE(SUM(CASE WHEN lang = 'fr' THEN len($sqlTokens) END), 0) AS BIGINT) AS fr,
              |       CAST(COALESCE(SUM(CASE WHEN lang = 'zh' THEN len($sqlTokens) END), 0) AS BIGINT) AS zh
              |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    ("temperature_mixture",
      (spark, dir) =>
        Curation.temperatureWeights(Tables.documents(spark, dir), alpha = 0.7)
          .transform(CatalogCore.orderedReport(_, col("lang"))),
      Some(s"""WITH per AS (
              |  SELECT lang, COUNT(*) AS n_docs,
              |         CAST(SUM(len($sqlTokens)) AS BIGINT) AS n_tokens
              |  FROM documents GROUP BY 1),
              |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM per),
              |w AS (
              |  SELECT lang, n_docs, n_tokens,
              |         CAST(n_tokens AS DOUBLE) / t AS p_raw,
              |         CAST(round(pow(CAST(n_tokens AS DOUBLE) / t, 0.7) * 1000000) AS BIGINT) AS weight_micro,
              |         t
              |  FROM per CROSS JOIN tot),
              |s AS (SELECT CAST(SUM(weight_micro) AS BIGINT) AS sw FROM w)
              |SELECT lang, n_docs, n_tokens, p_raw, weight_micro,
              |       CAST(weight_micro AS DOUBLE) / sw AS sample_prob,
              |       CAST(round((CAST(weight_micro AS DOUBLE) / sw) * t) AS BIGINT) AS expected_tokens
              |FROM w CROSS JOIN s ORDER BY lang""".stripMargin)),

    ("weighted_mixture_sample",
      (spark, dir) => {
        // same single-reference shape as lang_balanced_sample: rates
        // broadcast into one corpus pass, n_kept as a conditional sum.
        val docs = Tables.documents(spark, dir).select(col("lang"), col("doc_id"))
        val rates = Curation.weightedRates(docs, mixtureWeights, groupCol = "lang")
        docs.join(broadcast(rates), Seq("lang"))
          .groupBy(col("lang"))
          .agg(min(col("n_docs")).as("n_docs"),
               min(col("keep_per_10k")).as("keep_per_10k"),
               sum(when(Curation.hashBucket(col("doc_id"), 10000) < col("keep_per_10k"),
                        1L).otherwise(0L)).as("n_kept"))
          .transform(CatalogCore.orderedReport(_, col("lang")))
      },
      Some(s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
              |w(lang, wt) AS (VALUES $sqlMixtureWeights),
              |cw AS (SELECT c.lang, n, wt FROM c JOIN w USING (lang)),
              |m AS (SELECT MIN(CAST(n AS DOUBLE) / wt) AS s FROM cw),
              |thr AS (SELECT lang, n,
              |               CASE WHEN CAST(n AS DOUBLE) / wt = s THEN CAST(10000 AS BIGINT)
              |                    ELSE LEAST(CAST(10000 AS BIGINT),
              |                               CAST(floor(s * wt * 10000 / n) AS BIGINT)) END AS keep_per_10k
              |        FROM cw CROSS JOIN m),
              |k AS (SELECT d.lang, COUNT(*) AS n_kept
              |      FROM documents d JOIN thr USING (lang)
              |      WHERE ${sqlHashBucket("d.doc_id", 10000)} < thr.keep_per_10k
              |      GROUP BY 1)
              |SELECT t.lang, t.n AS n_docs, t.keep_per_10k, COALESCE(k.n_kept, 0) AS n_kept
              |FROM thr t LEFT JOIN k USING (lang) ORDER BY t.lang""".stripMargin)),

    // ── train→eval decontamination: train docs sharing ≥2 distinct word
    //    5-gram shingles with any val/test doc (df-cap 50 kills
    //    stop-shingles). The oracle rebuilds the same hash split, shingle
    //    set, cap, and pair thresholds.
    ("decontamination_report",
      (spark, dir) =>
        Curation.contaminationReport(Tables.documents(spark, dir))
          .orderBy(col("doc_id")),
      Some(s"""WITH sh AS (SELECT DISTINCT doc_id, unnest(${sqlShingles(5)}) AS g FROM documents),
              |keep AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) <= 50),
              |shc AS (SELECT sh.doc_id, sh.g FROM sh JOIN keep USING (g)),
              |sp AS (SELECT doc_id,
              |              CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
              |       FROM (SELECT doc_id, $sqlHashBucket100 AS b FROM documents)),
              |pairs AS (
              |  SELECT t.doc_id AS train_id, e.doc_id AS eval_id, COUNT(*) AS shared
              |  FROM shc t JOIN sp st ON t.doc_id = st.doc_id AND st.split = 'train'
              |  JOIN shc e ON t.g = e.g
              |  JOIN sp se ON e.doc_id = se.doc_id AND se.split <> 'train'
              |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
              |SELECT train_id AS doc_id, COUNT(*) AS n_eval_docs, MAX(shared) AS max_shared,
              |       CAST(SUM(shared) AS BIGINT) AS total_shared
              |FROM pairs GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // ── span-level decontamination (the GPT-3 appendix discipline at this
    //    corpus's scale): maximal spans in val/test docs whose every
    //    8-token window appears verbatim somewhere in train — the span
    //    surface behind decontamination_report's doc-pair counts. Same
    //    internal-key freedom as duplicate_spans: Spark buckets windows by
    //    xxhash64, the oracle by md5 prefix; the hash pins the spans.
    ("contamination_spans",
      (spark, dir) =>
        Curation.contaminationSpans(Tables.documents(spark, dir), 8)
          .orderBy(col("doc_id"), col("span_start")),
      Some(s"""WITH toks0 AS (
              |  SELECT doc_id, string_split(text, ' ') AS t, $sqlHashBucket100 AS b
              |  FROM documents),
              |grams AS (
              |  SELECT doc_id, b, i - 1 AS pos,
              |         substr(md5(array_to_string(list_slice(t, i, i + 7), ' ')), 1, 16) AS gkey
              |  FROM (SELECT doc_id, b, t, unnest(range(1, len(t) - 6)) AS i
              |        FROM toks0 WHERE len(t) >= 8)),
              |tk AS (SELECT DISTINCT gkey FROM grams WHERE b < 80),
              |ev AS (SELECT g.doc_id, g.b, g.pos FROM grams g JOIN tk USING (gkey)
              |       WHERE g.b >= 80),
              |isl AS (SELECT doc_id, b, pos,
              |               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
              |        FROM ev)
              |SELECT doc_id, CASE WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
              |       MIN(pos) AS span_start, MAX(pos) - MIN(pos) + 8 AS span_tokens
              |FROM isl GROUP BY doc_id, island, b
              |ORDER BY doc_id, span_start""".stripMargin)),

    // ── PII masking + markup scrub (ops/Scrub): the pre-dedup cleaning
    //    pass of a training-data pipeline. The corpus is synthetic word
    //    salad with no natural PII, so the query plants deterministic
    //    doc_id-derived dirt (tag, email, phone, URL, IPv4) in every
    //    document — the same synthesize-then-operate pattern as the
    //    lifecycle model — and then runs the real operator. Entity counts
    //    are mask-token counts in the output (literal-replace length
    //    deltas — one codegen'd string op each, not four more regex scans;
    //    equal to replacements made because the input reserves the bracket
    //    vocabulary); residual_pii re-scans the cleaned text with the
    //    one-pass PII alternation and must come out 0. Patterns are
    //    RE2-safe and the oracle runs the identical strings, so the masked
    //    text (and therefore chars_removed) is bit-for-bit portable.
    ("pii_scrub_stats",
      (spark, dir) => {
        val dirty = concat(
          col("text"),
          lit(" <b>contact</b> user"), col("doc_id").cast("string"),
          lit("@mail.example.org +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" http://site"), (col("doc_id") % 7).cast("string"),
          lit(".example.com/p/"), col("doc_id").cast("string"),
          lit(" from 10."), (col("doc_id") % 200).cast("string"),
          lit("."), ((col("doc_id") * 7) % 250).cast("string"),
          lit("."), ((col("doc_id") * 13) % 250).cast("string"))
        val staged = Tables.documents(spark, dir)
          // ~15 regex passes per row make this pipeline CPU-bound, and the
          // corpus arrives as few scan splits at small SF — spread the rows
          // one slice per core before the scalar work (explicit N so AQE
          // doesn't coalesce the exchange away; the shuffle carries only
          // the input columns). On a cluster the scan already has the
          // parallelism and this exchange is load-balancing, not rescue.
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("source"), dirty.as("s0"))
          .withColumn("s1", Scrub.stripTags(col("s0")))
          .withColumn("s2", Scrub.maskUrls(col("s1")))
          .withColumn("s3", Scrub.maskEmails(col("s2")))
          .withColumn("s4", Scrub.maskIps(col("s3")))
          .withColumn("s5", Scrub.maskPhones(col("s4")))
          .withColumn("clean", Scrub.normalizeWhitespace(col("s5")))
        staged.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
               sum(Scrub.countMatches(col("s0"), Scrub.tagPattern)).as("n_tags"),
               sum(Scrub.tokenCount(col("s5"), Scrub.urlToken)).as("n_urls"),
               sum(Scrub.tokenCount(col("s5"), Scrub.emailToken)).as("n_emails"),
               sum(Scrub.tokenCount(col("s5"), Scrub.ipToken)).as("n_ips"),
               sum(Scrub.tokenCount(col("s5"), Scrub.phoneToken)).as("n_phones"),
               countDistinct(Scrub.urlDomain(col("s1"))).as("n_domains"),
               sum((length(col("s0")) - length(col("clean"))).cast("long"))
                 .as("chars_removed"),
               sum(Scrub.countMatches(col("clean"), Scrub.urlPattern) +
                   Scrub.countMatches(col("clean"), Scrub.emailPattern) +
                   Scrub.countMatches(col("clean"), Scrub.ipPattern) +
                   Scrub.countMatches(col("clean"), Scrub.phonePattern))
                 .as("residual_pii"))
          .transform(CatalogCore.orderedReport(_, col("source")))
      },
      Some("""WITH d0 AS (
             |  SELECT source,
             |         text || ' <b>contact</b> user' || CAST(doc_id AS VARCHAR)
             |              || '@mail.example.org +1-555-'
             |              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |              || ' http://site' || CAST(doc_id % 7 AS VARCHAR)
             |              || '.example.com/p/' || CAST(doc_id AS VARCHAR)
             |              || ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
             |              || '.' || CAST((doc_id * 7) % 250 AS VARCHAR)
             |              || '.' || CAST((doc_id * 13) % 250 AS VARCHAR) AS s0
             |  FROM documents),
             |d1 AS (SELECT *, regexp_replace(s0, '<[^<>]+>', ' ', 'g') AS s1 FROM d0),
             |d2 AS (SELECT *, regexp_replace(s1, 'https?://[^ ]+', '[URL]', 'g') AS s2 FROM d1),
             |d3 AS (SELECT *, regexp_replace(s2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS s3 FROM d2),
             |d4 AS (SELECT *, regexp_replace(s3, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g') AS s4 FROM d3),
             |d5 AS (SELECT *, regexp_replace(s4, '\+?[0-9]{1,3}[-.][0-9]{3}[-.][0-9]{4}', '[PHONE]', 'g') AS s5 FROM d4),
             |d6 AS (SELECT *, trim(regexp_replace(s5, '[ \t\n\r]+', ' ', 'g')) AS clean FROM d5)
             |SELECT source, COUNT(*) AS n_docs,
             |       CAST(SUM(len(regexp_extract_all(s0, '<[^<>]+>'))) AS BIGINT) AS n_tags,
             |       CAST(SUM((length(s5) - length(replace(s5, '[URL]', ''))) // 5) AS BIGINT) AS n_urls,
             |       CAST(SUM((length(s5) - length(replace(s5, '[EMAIL]', ''))) // 7) AS BIGINT) AS n_emails,
             |       CAST(SUM((length(s5) - length(replace(s5, '[IP]', ''))) // 4) AS BIGINT) AS n_ips,
             |       CAST(SUM((length(s5) - length(replace(s5, '[PHONE]', ''))) // 7) AS BIGINT) AS n_phones,
             |       COUNT(DISTINCT regexp_extract(s1, 'https?://([^/ ]+)', 1)) AS n_domains,
             |       CAST(SUM(length(s0) - length(clean)) AS BIGINT) AS chars_removed,
             |       CAST(SUM(len(regexp_extract_all(clean, 'https?://[^ ]+'))
             |              + len(regexp_extract_all(clean, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |              + len(regexp_extract_all(clean, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
             |              + len(regexp_extract_all(clean, '\+?[0-9]{1,3}[-.][0-9]{3}[-.][0-9]{4}'))) AS BIGINT) AS residual_pii
             |FROM d6 GROUP BY source ORDER BY source""".stripMargin)),

    // ── IVF clustering + assignment, hash-checked end to end: fixed-point
    //    k-means (seed from lowest vec_ids → one Lloyd round → final
    //    rounded-cosine argmax assignment). Round 4's one no-oracle row
    //    (ivf_topk) existed because float-mean centroids weren't
    //    engine-portable; the fixed-point Lloyd update (exact BIGINT lane
    //    sums — see [[graft.ops.Similarity.kmeansCentroids]]) removes that
    //    barrier, so the DuckDB twin reproduces the whole clustering and the
    //    driver hashes it. The composed probe/top-k surface (ivfTopK) stays
    //    spec-bounded (recall vs exact top-k in SimilaritySpec) — its output
    //    is k-truncated per query, so a single assignment flip would cascade;
    //    this row pins the arithmetic those results are built from.
    ("ivf_assign",
      (spark, dir) =>
        // global range sort, NOT orderedReport: the assignment table is one
        // row per corpus vector, so the report bound's limit(100000) would
        // silently truncate at >=100k embeddings while the LIMIT-less
        // oracle doesn't — exactly the corpus-growing case the
        // orderedReport scaladoc forbids. The range-bounds sampling job is
        // the price of a scalable total order on a corpus-proportional
        // output (round-7 review finding).
        Similarity.ivfAssignments(
            Tables.embeddings(spark, dir).filter(col("vec_id") >= 8),
            nCentroids = 16, iters = 1)
          .orderBy(col("vec_id")),
      Some(s"""WITH ${sqlKmeans("vec_id >= 8", 16, 1)}
              |SELECT vec_id, cluster_id, cos_sim FROM (
              |  SELECT c.vec_id, kk.cluster_id,
              |         round(list_cosine_similarity(c.emb, kk.centroid), 6) AS cos_sim,
              |         row_number() OVER (PARTITION BY c.vec_id
              |           ORDER BY round(list_cosine_similarity(c.emb, kk.centroid), 6) DESC,
              |                    kk.cluster_id) AS rn
              |  FROM corpus c CROSS JOIN cent1 kk) WHERE rn = 1
              |ORDER BY vec_id""".stripMargin)),

    // ── SemDeDup-style semantic dedup, hash-checked end to end: fixed-point
    //    k-means clustering → within-cluster exact-cosine pairs (the scale
    //    bound — pairwise work is per-cluster, never corpus²) → connected
    //    components → lowest-vec_id survivor per component. The oracle
    //    rebuilds the identical pipeline relationally (sqlKmeans clustering,
    //    within-cluster pair join, recursive-CTE transitive closure, anti
    //    join), so a wrong assignment, a missed pair, or a wrong survivor
    //    shifts the hash.
    //    The natural corpus has no cos≥0.8 pairs (max pairwise ≈0.60 at
    //    every SF), so the row STAGES deterministic near-dups — jittered
    //    copies of the 50 lowest vec_ids (x·1.01 + 0.001, float-cast on
    //    both engines) at vec_id+1_000_000 — and the removal path then
    //    genuinely runs: the planted copies land in their original's
    //    cluster, pair above threshold, and lose to the lower id. Same
    //    staging discipline as boilerplate_line_stats.
    ("semantic_dedup",
      (spark, dir) => {
        val base = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
        val planted = base.filter(col("vec_id") < 50)
          .select((col("vec_id") + 1000000L).as("vec_id"),
                  expr("transform(embedding, x -> CAST(x * 1.01D + 0.001D AS FLOAT))")
                    .as("embedding"))
        Similarity.semanticDedup(base.unionByName(planted), 0.8,
            nCentroids = 16, iters = 1)
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n_survivors"),
               sum(col("vec_id")).as("id_sum"),
               min(col("vec_id")).as("min_vec"))
          .transform(CatalogCore.orderedReport(_, col("cluster_id")))
      },
      Some(s"""WITH RECURSIVE ${sqlKmeansCorpus(
                """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
                  |  UNION ALL
                  |  SELECT vec_id + 1000000,
                  |         CAST(list_transform(embedding,
                  |                x -> CAST(x * 1.01 + 0.001 AS FLOAT)) AS DOUBLE[])
                  |  FROM embeddings WHERE vec_id < 50""".stripMargin, 16, 1)},
              |assign AS (
              |  SELECT vec_id, cluster_id FROM (
              |    SELECT c.vec_id, kk.cluster_id,
              |           row_number() OVER (PARTITION BY c.vec_id
              |             ORDER BY round(list_cosine_similarity(c.emb, kk.centroid), 6) DESC,
              |                      kk.cluster_id) AS rn
              |    FROM corpus c CROSS JOIN cent1 kk) WHERE rn = 1),
              |p AS (
              |  SELECT a.vec_id AS va, b.vec_id AS vb
              |  FROM assign a JOIN assign b
              |    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
              |  JOIN corpus ca ON ca.vec_id = a.vec_id
              |  JOIN corpus cb ON cb.vec_id = b.vec_id
              |  WHERE round(list_cosine_similarity(ca.emb, cb.emb), 6) >= 0.8),
              |edges AS (SELECT va AS a, vb AS b FROM p
              |          UNION ALL SELECT vb AS a, va AS b FROM p),
              |reach(a, b) AS (
              |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
              |losers AS (
              |  SELECT a AS vec_id
              |  FROM (SELECT a, MIN(b) AS canonical FROM reach GROUP BY a)
              |  WHERE a <> canonical),
              |surv AS (
              |  SELECT s.vec_id, s.cluster_id FROM assign s
              |  ANTI JOIN losers l ON s.vec_id = l.vec_id)
              |SELECT cluster_id, COUNT(*) AS n_survivors,
              |       CAST(SUM(vec_id) AS BIGINT) AS id_sum,
              |       MIN(vec_id) AS min_vec
              |FROM surv GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ── Sliding-window chunking (long doc → training examples): 50-token
    //    windows every 25 tokens, trailing short windows kept. Hash-only
    //    output (withText=false) — the chunk payload is pinned through
    //    md5(chunk), so a boundary off-by-one or a dropped trailing window
    //    shifts the hash while the shuffled bytes stay narrow. Map-side
    //    explode; the only exchange is the output sort.
    ("doc_chunks",
      (spark, dir) =>
        Curation.chunkDocs(
            Tables.spread(Tables.documents(spark, dir), col("doc_id")),
            window = 50, stride = 25, withText = false)
          .orderBy(col("doc_id"), col("chunk_idx")),
      Some(s"""WITH base AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
              |idx AS (
              |  SELECT doc_id, toks,
              |         CAST(unnest(range(0, CAST(floor((len(toks) + 24) / 25) AS BIGINT))) AS INTEGER) AS chunk_idx
              |  FROM base),
              |ch AS (
              |  SELECT doc_id, chunk_idx,
              |         array_to_string(toks[(chunk_idx*25+1):(chunk_idx*25+50)], ' ') AS chunk_text
              |  FROM idx)
              |SELECT doc_id, chunk_idx,
              |       CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_tokens,
              |       md5(chunk_text) AS chunk_hash
              |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ── Line-level boilerplate removal (the web-corpus cleaning pass:
    //    lines shared by ≥2 distinct docs are chrome/footer repeats, not
    //    prose). The corpus has no newline structure, so the row stages it
    //    deterministically — 7-token lines — and then runs the REAL
    //    operator: line explode → distinct-doc frequency → anti-join →
    //    ordered reassembly. Planted near-dup docs share full lines, so the
    //    removal path is genuinely exercised (nonzero drops at every SF).
    //    Cleaned text is pinned via md5; docs reduced to nothing stay as
    //    rows with empty-text hash.
    ("boilerplate_line_stats",
      (spark, dir) => {
        // staging + line explode are CPU-heavy per-row HOF work over a
        // single-row-group scan — spread to all cores first (the
        // minhash/tfidf parallelism rescue)
        val docs = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
        val toks = split(col("text"), " ")
        val nLines = floor((size(toks) + 6) / 7).cast("int")
        val staged = docs.select(col("doc_id"),
          array_join(
            transform(sequence(lit(0), nLines - 1),
                      i => array_join(slice(toks, i * 7 + 1, lit(7)), " ")),
            "\n").as("text"))
        Dedup.dropBoilerplateLines(staged, minDocs = 2)
          .select(col("doc_id"), col("n_lines_kept"), col("n_lines_dropped"),
                  md5(col("clean_text").cast("binary")).as("clean_hash"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
              |ln AS (
              |  SELECT doc_id, toks,
              |         unnest(range(0, CAST(floor((len(toks) + 6) / 7) AS BIGINT))) AS line_idx
              |  FROM base),
              |lines AS (
              |  SELECT doc_id, line_idx,
              |         array_to_string(toks[(line_idx*7+1):(line_idx*7+7)], ' ') AS line
              |  FROM ln),
              |boiler AS (
              |  SELECT line FROM (
              |    SELECT line, COUNT(DISTINCT doc_id) AS nd FROM lines GROUP BY 1)
              |  WHERE nd >= 2),
              |kept AS (
              |  SELECT l.* FROM lines l ANTI JOIN boiler b ON l.line = b.line),
              |agg AS (
              |  SELECT doc_id, COUNT(*) AS n_lines_kept,
              |         md5(string_agg(line, chr(10) ORDER BY line_idx)) AS clean_hash
              |  FROM kept GROUP BY 1),
              |tot AS (
              |  SELECT doc_id,
              |         CAST(floor((len(toks) + 6) / 7) AS BIGINT) AS n_total
              |  FROM base)
              |SELECT t.doc_id,
              |       COALESCE(a.n_lines_kept, 0) AS n_lines_kept,
              |       t.n_total - COALESCE(a.n_lines_kept, 0) AS n_lines_dropped,
              |       COALESCE(a.clean_hash, md5('')) AS clean_hash
              |FROM tot t LEFT JOIN agg a USING (doc_id)
              |ORDER BY t.doc_id""".stripMargin)),

    // ── Token-distribution Shannon entropy (diversity signal, the
    //    complement of the Gopher repetition fractions). Hash-exact across
    //    engines by the integer-units trick: per-type contributions rounded
    //    to BIGINT micro-nats, per-doc value = the integer sum (order-
    //    independent; micro-nat rounding absorbs ln() last-ulp differences
    //    — same tolerance class the rounded-cosine oracles already prove).
    ("token_entropy",
      (spark, dir) =>
        TextAnalysis.tokenEntropy(Tables.documents(spark, dir))
          .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest($sqlTokens) AS t FROM documents),
              |counts AS (
              |  SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY 1, 2),
              |wn AS (
              |  SELECT doc_id, c,
              |         CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
              |  FROM counts)
              |SELECT doc_id,
              |       MAX(n) AS n_tokens,
              |       COUNT(*) AS n_types,
              |       CAST(SUM(CAST(round((c / n) * ln(n / c) * 1000000) AS BIGINT)) AS BIGINT) AS entropy_unats
              |FROM wn GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // ── CCNet-style corpus-LM quality score: unigram LM fit on the corpus
    //    (top-30 vocab head, OOV floor p = 1/N), every doc scored by mean
    //    per-token NLL. Integer micro-nat NLLs (round(ln(N/c)·10⁶)) make
    //    per-doc sums exact BIGINT arithmetic — the token_entropy tolerance
    //    class; the vocab cutoff is pinned (count desc, token asc). At the
    //    test vocabulary (31 types) the top-30 head leaves exactly one OOV
    //    type, so the floor path is driver-hashed, not just spec'd.
    ("unigram_perplexity",
      (spark, dir) =>
        TextAnalysis.unigramNll(Tables.documents(spark, dir), vocabSize = 30)
          .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest($sqlTokens) AS t FROM documents),
              |counts AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY 1),
              |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts),
              |head AS (
              |  SELECT t, CAST(round(ln(CAST((SELECT n FROM tot) AS DOUBLE) / c) * 1000000) AS BIGINT) AS nll
              |  FROM counts ORDER BY c DESC, t ASC LIMIT 30),
              |scored AS (
              |  SELECT k.doc_id,
              |         COALESCE(h.nll,
              |                  CAST(round(ln(CAST((SELECT n FROM tot) AS DOUBLE)) * 1000000) AS BIGINT)) AS nll,
              |         CASE WHEN h.t IS NULL THEN 1 ELSE 0 END AS oov
              |  FROM toks k LEFT JOIN head h ON k.t = h.t)
              |SELECT doc_id, COUNT(*) AS n_tokens,
              |       CAST(SUM(oov) AS BIGINT) AS n_oov,
              |       CAST(SUM(nll) AS BIGINT) AS nll_unats,
              |       CAST(SUM(nll) AS DOUBLE) / COUNT(*) AS mean_nll_unats
              |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // ── interpolated bigram LM perplexity (the KenLM-style upgrade of
    //    unigram_perplexity): -ln(0.75·p(b|a) + 0.25·p(b)) per bigram
    //    position, MLE models fit on the corpus, model-as-RELATION scoring
    //    (the bigram table is corpus-bounded, not broadcastable — the
    //    honest at-scale LM-scoring shape). Integer micro-nat NLLs; the
    //    twin refits both models and the interpolation relationally.
    ("bigram_perplexity",
      (spark, dir) =>
        TextAnalysis.bigramNll(Tables.documents(spark, dir), lambda = 0.75)
          .orderBy(col("doc_id")),
      Some(s"""WITH bi AS (
              |  SELECT doc_id, unnest(${sqlShingles(2)}) AS g FROM documents
              |  WHERE len($sqlTokens) >= 2),
              |c2 AS (SELECT g, COUNT(*) AS n2 FROM bi GROUP BY 1),
              |cf AS (SELECT string_split(g, ' ')[1] AS a, CAST(SUM(n2) AS BIGINT) AS na
              |       FROM c2 GROUP BY 1),
              |uni AS (
              |  SELECT t, COUNT(*) AS n1
              |  FROM (SELECT unnest($sqlTokens) AS t FROM documents) GROUP BY 1),
              |tot AS (SELECT CAST(SUM(n1) AS BIGINT) AS n FROM uni),
              |scored AS (
              |  SELECT bi.doc_id,
              |         CAST(round(ln(1.0 / (0.75 * (CAST(c2.n2 AS DOUBLE) / cf.na)
              |                     + 0.25 * (CAST(uni.n1 AS DOUBLE) / CAST(tot.n AS DOUBLE))))
              |                    * 1000000) AS BIGINT) AS nll
              |  FROM bi
              |  JOIN c2 USING (g)
              |  JOIN cf ON cf.a = string_split(bi.g, ' ')[1]
              |  JOIN uni ON uni.t = string_split(bi.g, ' ')[2]
              |  CROSS JOIN tot)
              |SELECT doc_id, COUNT(*) AS n_bigrams,
              |       CAST(SUM(nll) AS BIGINT) AS nll_unats,
              |       CAST(SUM(nll) AS DOUBLE) / COUNT(*) AS mean_nll_unats
              |FROM scored GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // ── collocation mining by PMI (the word2vec phrase-detection
    //    statistic): adjacent-pair association over the corpus, model
    //    tables vocabulary-bounded, minCount prune before the marginal
    //    joins. PMI is a difference of two non-negative rounded micro-nat
    //    lns with left-associative products, so the twin's doubles match
    //    bit for bit.
    ("collocation_pmi",
      (spark, dir) =>
        TextAnalysis.collocationPmi(Tables.documents(spark, dir), minCount = 5),
      Some(s"""WITH bi AS (
              |  SELECT unnest(${sqlShingles(2)}) AS g FROM documents
              |  WHERE len($sqlTokens) >= 2),
              |c2 AS (SELECT g, COUNT(*) AS n_pair FROM bi GROUP BY 1),
              |uni AS (SELECT t, COUNT(*) AS n_tok
              |        FROM (SELECT unnest($sqlTokens) AS t FROM documents) GROUP BY 1),
              |tot AS (SELECT (SELECT CAST(SUM(n_tok) AS BIGINT) FROM uni) AS n,
              |               (SELECT CAST(SUM(n_pair) AS BIGINT) FROM c2) AS p),
              |pairs AS (
              |  SELECT string_split(g, ' ')[1] AS a, string_split(g, ' ')[2] AS b, n_pair
              |  FROM c2 WHERE n_pair >= 5)
              |SELECT pp.a, pp.b, pp.n_pair,
              |       CAST(round(ln((CAST(pp.n_pair AS DOUBLE) * tot.n) * tot.n) * 1000000) AS BIGINT)
              |     - CAST(round(ln((CAST(tot.p AS DOUBLE) * ua.n_tok) * ub.n_tok) * 1000000) AS BIGINT) AS pmi_unats
              |FROM pairs pp
              |JOIN uni ua ON ua.t = pp.a
              |JOIN uni ub ON ub.t = pp.b
              |CROSS JOIN tot
              |ORDER BY pmi_unats DESC, a, b""".stripMargin)),

    // ── model-based quality filtering (the GPT-3/CCNet classifier stage):
    //    multinomial Naive Bayes log-odds fit on the corpus itself —
    //    reference class = lang 'en' documents — scored over every doc.
    //    Same fit+score twin-pass shape as unigram_perplexity; weights are
    //    DIFFERENCES of two non-negative rounded micro-nat terms so Java
    //    half-up and SQL half-away rounding agree (the signed-weight
    //    wrinkle, see the nbClassifierScores scaladoc). The twin refits the
    //    whole model relationally, so vocab selection, smoothing, class
    //    totals, and every weight are all under the driver's hash.
    ("nb_quality_scores",
      (spark, dir) =>
        TextAnalysis.nbClassifierScores(Tables.documents(spark, dir),
            refLang = "en", vocabSize = 50)
          .orderBy(col("doc_id")),
      Some(s"""WITH $sqlNbScoredCtes
              |SELECT doc_id, lang, n_tokens, logodds_unats, mean_logodds_unats
              |FROM nbdoc ORDER BY doc_id""".stripMargin)),

    // ── Active-learning margin batch (uncertainty sampling, Lewis & Gale
    //    1994): the k docs whose NB score sits closest to the decision
    //    boundary — |mean log-odds| ascending — are exactly the ones a
    //    labeling round or a classifier-improvement loop should read
    //    next; confident docs teach nothing. TakeOrdered on
    //    (margin, doc_id) — k-bounded at any corpus size, no global sort.
    //    The margin is the |·| of an exact integer ratio surfaced once as
    //    double — ties break on doc_id so both engines cut identically.
    ("uncertainty_sample",
      (spark, dir) =>
        TextAnalysis.nbClassifierScores(Tables.documents(spark, dir),
            refLang = "en", vocabSize = 50)
          .select(col("doc_id"), col("lang"), col("n_tokens"),
                  col("mean_logodds_unats"),
                  abs(col("mean_logodds_unats")).as("margin_unats"))
          .orderBy(col("margin_unats"), col("doc_id")).limit(100),
      Some(s"""WITH $sqlNbScoredCtes
              |SELECT doc_id, lang, n_tokens, mean_logodds_unats,
              |       abs(mean_logodds_unats) AS margin_unats
              |FROM nbdoc ORDER BY margin_unats, doc_id LIMIT 100""".stripMargin)),

    // ── curriculum manifest: quality-quartile phase per document from the
    //    NB classifier score — phase 1 = top quality trained first. NOT an
    //    ntile window (global single-partition sort): one exact-percentile
    //    aggregate yields 3 literal thresholds, then a map-side bracket
    //    comparison — two scans at any scale. Spark percentile and DuckDB
    //    quantile_cont share the interpolation formula (the
    //    value_percentiles pairing); thresholds round to 6.
    ("curriculum_phases",
      (spark, dir) =>
        Curation.curriculumPhases(
            TextAnalysis.nbClassifierScores(Tables.documents(spark, dir),
              refLang = "en", vocabSize = 50),
            phases = 4)
          .select(col("doc_id"), col("phase"), col("mean_logodds_unats"))
          .orderBy(col("doc_id")),
      Some(s"""WITH $sqlNbScoredCtes,
              |cuts AS (
              |  SELECT round(quantile_cont(mean_logodds_unats, 0.25), 6) AS c1,
              |         round(quantile_cont(mean_logodds_unats, 0.5), 6) AS c2,
              |         round(quantile_cont(mean_logodds_unats, 0.75), 6) AS c3
              |  FROM nbdoc)
              |SELECT doc_id,
              |       CAST(4 - (CASE WHEN mean_logodds_unats > c1 THEN 1 ELSE 0 END
              |               + CASE WHEN mean_logodds_unats > c2 THEN 1 ELSE 0 END
              |               + CASE WHEN mean_logodds_unats > c3 THEN 1 ELSE 0 END) AS INTEGER) AS phase,
              |       mean_logodds_unats
              |FROM nbdoc CROSS JOIN cuts ORDER BY doc_id""".stripMargin)),

    // ── DSIR importance weights (Xie et al. 2023): hashed-bigram bucket
    //    models, target = src0/src1 domain vs the whole corpus, per-doc
    //    log importance weight in integer micro-nats. The twin refits both
    //    bucket models relationally — bucket hashing, smoothing, totals,
    //    and every weight are all under the driver's hash. Fit is
    //    bucket-bounded (256 rows), score is scan + per-doc aggregate.
    ("dsir_weights",
      (spark, dir) =>
        Curation.dsirWeights(Tables.documents(spark, dir),
            targetSources = Seq("src0", "src1"))
          .orderBy(col("doc_id")),
      Some(s"""WITH feats AS (
              |  SELECT doc_id, source, ${sqlHashBucket("g", 256)} AS b
              |  FROM (SELECT doc_id, source, unnest(${sqlShingles(2)}) AS g
              |        FROM documents)),
              |cnt AS (
              |  SELECT b,
              |         CAST(SUM(CASE WHEN source IN ('src0','src1') THEN 1 ELSE 0 END) AS BIGINT) AS ct,
              |         COUNT(*) AS cr
              |  FROM feats GROUP BY 1),
              |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
              |               CAST(SUM(cr) AS BIGINT) AS nr FROM cnt),
              |w AS (
              |  SELECT b, CAST(round(ln((nr + 256) / (cr + 1.0)) * 1000000) AS BIGINT)
              |           - CAST(round(ln((nt + 256) / (ct + 1.0)) * 1000000) AS BIGINT) AS wt
              |  FROM cnt CROSS JOIN tot)
              |SELECT doc_id, any_value(source) AS source, COUNT(*) AS n_feats,
              |       CAST(SUM(wt) AS BIGINT) AS logweight_unats,
              |       CAST(SUM(wt) AS DOUBLE) / COUNT(*) AS mean_logweight_unats
              |FROM feats JOIN w USING (b)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ── MinHash-LSH candidate quality, hash-checked (the ann_recall
    //    pattern applied to the text-dedup path): exact Jaccard ≥ 0.5 pairs
    //    are the ground truth, the banded LSH pairs are the approximation,
    //    and one full-outer-join aggregate reports truth size, candidate
    //    size, hits, and recall. Both sides are deterministic and already
    //    individually oracle'd — this row pins the approximation quality
    //    itself with the driver's hash (a banding/threshold regression
    //    changes the counts).
    ("lsh_recall",
      (spark, dir) => {
        val docs = Tables.documents(spark, dir)
        val truth = Dedup.ngramJaccardPairs(docs, 3, 0.5)
          .select(col("doc_a"), col("doc_b")).withColumn("t", lit(1L))
        val cand = Dedup.lshCandidatePairs(docs, 8, 2)
          .withColumn("hit", lit(1L))
        truth.join(cand, Seq("doc_a", "doc_b"), "full_outer")
          .agg(count(col("t")).as("n_true"),
               count(col("hit")).as("n_candidates"),
               sum(when(col("t").isNotNull && col("hit").isNotNull, 1L)
                 .otherwise(0L)).as("n_hit"))
          .select(col("n_true"), col("n_candidates"), col("n_hit"),
                  (col("n_hit").cast("double") / col("n_true")).as("recall"))
          .orderBy(col("n_true"))
      },
      Some {
        val sigs = (0 until 8).map(i => s"${sqlMinhash(i)} AS s$i").mkString(", ")
        val bands = (0 until 4).map(i => s"md5(s${2 * i} || '|' || s${2 * i + 1}) AS b$i").mkString(", ")
        val joins = (0 until 4).map(i =>
          s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             |FROM bands a JOIN bands b ON a.b$i = b.b$i AND a.doc_id < b.doc_id""".stripMargin)
          .mkString("\nUNION\n")
        s"""WITH sh AS (
           |  SELECT DISTINCT doc_id, unnest(${sqlShingles(3)}) AS g FROM documents),
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
           |p AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
           |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |truth AS (
           |  SELECT doc_a, doc_b FROM p
           |  JOIN sizes sa ON doc_a = sa.doc_id
           |  JOIN sizes sb ON doc_b = sb.doc_id
           |  WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
           |sigs AS (SELECT doc_id, $sigs FROM documents),
           |bands AS (SELECT doc_id, $bands FROM sigs),
           |cand AS (SELECT DISTINCT doc_a, doc_b FROM ($joins))
           |SELECT COUNT(t.doc_a) AS n_true,
           |       COUNT(c.doc_a) AS n_candidates,
           |       CAST(SUM(CASE WHEN t.doc_a IS NOT NULL AND c.doc_a IS NOT NULL
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           |       CAST(SUM(CASE WHEN t.doc_a IS NOT NULL AND c.doc_a IS NOT NULL
           |                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(t.doc_a) AS recall
           |FROM truth t FULL JOIN cand c
           |  ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
           |ORDER BY 1""".stripMargin
      }),

    // ── The dedup pipeline's actual OUTPUT, driver-hashed: survivors of
    //    exact + near-dup removal (Pipeline.dedupedDocs — drop every
    //    non-canonical member of a byte-identical group or a Jaccard ≥ 0.5
    //    cluster, df-capped universe as in ngram_jaccard_dups). The cluster
    //    and exact-group steps are green individually; this row pins the
    //    composed survivor rule a real corpus run applies, as per-
    //    (lang, source) counts + id checksum + char mass. Oracle rebuilds
    //    both loser sets (window-framed exact groups, recursive-CTE
    //    transitive closure) and anti-joins them away.
    ("dedup_survivor_stats",
      (spark, dir) =>
        Pipeline.dedupedDocs(Tables.documents(spark, dir))
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
               sum(Curation.hashBucket(col("doc_id"), 10000)).as("id_checksum"),
               sum(col("n_chars")).as("chars_total"))
          .transform(CatalogCore.orderedReport(_, col("lang"), col("source"))),
      Some(s"""WITH RECURSIVE exact_losers AS (
              |  SELECT doc_id FROM (
              |    SELECT doc_id,
              |           MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon,
              |           COUNT(*) OVER (PARTITION BY md5(text)) AS n
              |    FROM documents)
              |  WHERE n > 1 AND doc_id <> canon),
              |sh0 AS (
              |  SELECT DISTINCT doc_id, unnest(${sqlShingles(3)}) AS g FROM documents),
              |keep AS (
              |  SELECT g FROM (SELECT g, COUNT(*) AS df FROM sh0 GROUP BY g)
              |  WHERE df <= 50),
              |sh AS (SELECT sh0.doc_id, sh0.g FROM sh0 JOIN keep USING (g)),
              |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
              |cnt AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
              |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |pairs0 AS (
              |  SELECT doc_a, doc_b FROM cnt
              |  JOIN sizes sa ON doc_a = sa.doc_id
              |  JOIN sizes sb ON doc_b = sb.doc_id
              |  WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
              |edges AS (
              |  SELECT doc_a AS a, doc_b AS b FROM pairs0
              |  UNION ALL SELECT doc_b, doc_a FROM pairs0),
              |reach(a, b) AS (
              |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
              |near_losers AS (
              |  SELECT a AS doc_id FROM (
              |    SELECT a, MIN(b) AS canonical FROM reach GROUP BY a)
              |  WHERE a <> canonical),
              |losers AS (
              |  SELECT doc_id FROM exact_losers
              |  UNION SELECT doc_id FROM near_losers),
              |surv AS (
              |  SELECT d.* FROM documents d ANTI JOIN losers l ON d.doc_id = l.doc_id)
              |SELECT lang, source, COUNT(*) AS n_docs,
              |       CAST(SUM(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) % 10000) AS BIGINT) AS id_checksum,
              |       CAST(SUM(n_chars) AS BIGINT) AS chars_total
              |FROM surv GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── The COMPOSED curation pipeline, driver-hashed end to end
    //    (Pipeline.curate): exact dedup → near-dup removal → quality +
    //    language gate → deterministic split → train-shard sequence
    //    packing. Every stage is individually oracle'd (exact_dedup_docs /
    //    ngram_jaccard_dups / dup_clusters / quality_scores / lang_id /
    //    split_manifest / pack_sequences); this row pins the COMPOSITION —
    //    stage order, survivor rules, gate thresholds — by hashing the
    //    final packing manifest. The twin is the stage CTEs composed:
    //    dedup_survivor_stats' loser stack, quality/lang formulas inlined
    //    as the gate, the hash-bucket split, and the running-offset packer.
    ("curation_pipeline",
      (spark, dir) =>
        Pipeline.curate(Tables.documents(spark, dir))
          .transform(CatalogCore.orderedReport(_, col("shard"), col("seq_id"))),
      Some(s"""WITH RECURSIVE exact_losers AS (
              |  SELECT doc_id FROM (
              |    SELECT doc_id,
              |           MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon,
              |           COUNT(*) OVER (PARTITION BY md5(text)) AS n
              |    FROM documents)
              |  WHERE n > 1 AND doc_id <> canon),
              |sh0 AS (
              |  SELECT DISTINCT doc_id, unnest(${sqlShingles(3)}) AS g FROM documents),
              |keep AS (
              |  SELECT g FROM (SELECT g, COUNT(*) AS df FROM sh0 GROUP BY g)
              |  WHERE df <= 50),
              |sh AS (SELECT sh0.doc_id, sh0.g FROM sh0 JOIN keep USING (g)),
              |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
              |cnt AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
              |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |pairs0 AS (
              |  SELECT doc_a, doc_b FROM cnt
              |  JOIN sizes sa ON doc_a = sa.doc_id
              |  JOIN sizes sb ON doc_b = sb.doc_id
              |  WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
              |edges AS (
              |  SELECT doc_a AS a, doc_b AS b FROM pairs0
              |  UNION ALL SELECT doc_b, doc_a FROM pairs0),
              |reach(a, b) AS (
              |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
              |near_losers AS (
              |  SELECT a AS doc_id FROM (
              |    SELECT a, MIN(b) AS canonical FROM reach GROUP BY a)
              |  WHERE a <> canonical),
              |losers AS (
              |  SELECT doc_id FROM exact_losers
              |  UNION SELECT doc_id FROM near_losers),
              |surv AS (
              |  SELECT d.* FROM documents d ANTI JOIN losers l ON d.doc_id = l.doc_id),
              |gated AS (
              |  SELECT doc_id, source, text FROM (
              |    SELECT doc_id, source, text,
              |           len($sqlTokens) AS n_tokens,
              |           len(list_distinct($sqlTokens)) AS n_distinct,
              |           len(list_filter($sqlTokens, t -> list_contains($stopListSql, t))) AS stop_hits
              |    FROM surv)
              |  WHERE least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
              |          + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3
              |          + least((CAST(stop_hits AS DOUBLE) / n_tokens) * 5.0, 1.0) * 0.3 >= 0.3
              |    AND CAST(stop_hits AS DOUBLE) / n_tokens >= 0.04),
              |train AS (
              |  SELECT doc_id, source, text FROM (
              |    SELECT doc_id, source, text, $sqlHashBucket100 AS b FROM gated)
              |  WHERE b < 80),
              |t AS (SELECT source AS shard, doc_id, len($sqlTokens) AS n_tokens FROM train),
              |o AS (
              |  SELECT shard, n_tokens,
              |         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
              |  FROM t)
              |SELECT shard, CAST(floor(CAST(start_off AS DOUBLE) / 2048) AS BIGINT) AS seq_id,
              |       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
              |       'train' AS split
              |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── Tokenizer-training prep: the first BPE merge iteration — top-50
    //    adjacent-pair frequencies over the corpus with a pinned
    //    (count desc, pair asc) boundary tie-break. TakeOrdered plan.
    ("bpe_merge_candidates",
      (spark, dir) =>
        TextAnalysis.bpeMergeCandidates(Tables.documents(spark, dir), 50),
      Some(s"""WITH grams AS (
              |  SELECT unnest(${sqlShingles(2)}) AS pair FROM documents)
              |SELECT pair, COUNT(*) AS n FROM grams GROUP BY pair
              |ORDER BY n DESC, pair ASC LIMIT 50""".stripMargin)),

    // ── Z-order layout audit (Layout.zorderAudit — the OPTIMIZE ZORDER
    //    technique): keys max-scaled into 8-bit curve lanes (the
    //    rank-then-interleave step real implementations perform), rows
    //    bucketed by the top 8 Z-bits; per-bucket min/max of BOTH raw keys
    //    are the footer stats a scan would prune on. Exact BIGINT bit
    //    ladder, reproduced step for step in the twin.
    ("zorder_layout",
      (spark, dir) =>
        Layout.zorderAudit(Tables.lineitem(spark, dir),
                           col("l_orderkey"), col("l_partkey"),
                           bucketBits = 8)
          .orderBy(col("bucket")),
      Some {
        def spread(v: String, p: String) = Seq(
          s"($v | ($v << 4)) & 3855 AS ${p}b",
          s"(${p}b | (${p}b << 2)) & 13107 AS ${p}c",
          s"(${p}c | (${p}c << 1)) & 21845 AS ${p}d")
        s"""WITH m AS (SELECT MAX(l_orderkey) AS xm, MAX(l_partkey) AS ym FROM lineitem),
           |k AS (
           |  SELECT l_orderkey AS x, l_partkey AS y,
           |         (l_orderkey * 256) // (m.xm + 1) AS xs,
           |         (l_partkey * 256) // (m.ym + 1) AS ys
           |  FROM lineitem CROSS JOIN m),
           |s1 AS (SELECT x, y, ${spread("xs", "x")(0)}, ${spread("ys", "y")(0)} FROM k),
           |s2 AS (SELECT x, y, ${spread("xs", "x")(1)}, ${spread("ys", "y")(1)} FROM s1),
           |s3 AS (SELECT x, y, ${spread("xs", "x")(2)}, ${spread("ys", "y")(2)} FROM s2),
           |z AS (SELECT x, y, (xd | (yd << 1)) >> 8 AS bucket FROM s3)
           |SELECT bucket, COUNT(*) AS n_rows,
           |       MIN(x) AS x_min, MAX(x) AS x_max,
           |       MIN(y) AS y_min, MAX(y) AS y_max
           |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ── Path mining (Windows.topEventPaths): the 20 most frequent 3-step
    //    event-type sequences across per-user ordered streams — one key
    //    shuffle, lags ride the same sorted pass, TakeOrdered tail.
    ("event_path_trigrams",
      (spark, dir) =>
        Windows.topEventPaths(Tables.events(spark, dir), "user_id", "ts",
                              "event_type", col("event_id"), 3, 20),
      Some("""WITH s AS (
             |  SELECT lag(event_type, 2) OVER w AS s2,
             |         lag(event_type, 1) OVER w AS s1,
             |         event_type AS s0
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT s2 || '>' || s1 || '>' || s0 AS path, COUNT(*) AS n_paths
             |FROM s WHERE s2 IS NOT NULL
             |GROUP BY 1 ORDER BY n_paths DESC, path LIMIT 20""".stripMargin)),

    // ── Cohort retention matrix (Windows.retentionCohorts): users bucketed
    //    by first-seen week, distinct-counted per week offset — the
    //    (cohort, period, n_active) triangle every growth dashboard draws.
    ("retention_cohorts",
      (spark, dir) =>
        Windows.retentionCohorts(Tables.events(spark, dir), "user_id", "ts", 7)
          .orderBy(col("cohort"), col("period_no")),
      Some("""WITH p AS (
             |  SELECT user_id,
             |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) // 7 AS per
             |  FROM events),
             |fs AS (SELECT user_id, MIN(per) AS cohort FROM p GROUP BY 1)
             |SELECT fs.cohort, p.per - fs.cohort AS period_no,
             |       COUNT(DISTINCT p.user_id) AS n_active
             |FROM p JOIN fs USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── Cross-source overlap matrix (Curation.crossSourceOverlap): shared
    //    distinct 8-gram windows + gram Jaccard per source pair — the
    //    governance view of which corpus slices leak into which (pairwise
    //    generalization of the train→eval decontamination check).
    ("cross_source_overlap",
      (spark, dir) =>
        Curation.crossSourceOverlap(Tables.documents(spark, dir), 8)
          .orderBy(col("source_a"), col("source_b")),
      Some(s"""WITH g AS (
              |  SELECT DISTINCT source, substr(md5(u), 1, 16) AS gkey
              |  FROM (SELECT source, unnest(${sqlShingles(8)}) AS u FROM documents)),
              |t AS (SELECT source, COUNT(*) AS total FROM g GROUP BY 1),
              |p AS (
              |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
              |  FROM g a JOIN g b ON a.gkey = b.gkey AND a.source < b.source
              |  GROUP BY 1, 2)
              |SELECT source_a, source_b, n_shared,
              |       round(CAST(n_shared AS DOUBLE) / (ta.total + tb.total - n_shared), 6) AS jaccard
              |FROM p JOIN t ta ON ta.source = source_a
              |       JOIN t tb ON tb.source = source_b
              |ORDER BY source_a, source_b""".stripMargin)),

    // ── Last-touch attribution (AsOf.asofJoin): each purchase attributed
    //    to the user's latest at-or-before click, rolled up by the click's
    //    campaign (props k mod 10; NULL bucket = organic purchases with no
    //    prior click). The DuckDB twin uses its native ASOF LEFT JOIN —
    //    pinning our union+carry-forward construction against the engine
    //    primitive it re-expresses.
    ("purchase_attribution",
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"),
                  get_json_object(col("props"), "$.k").cast("long").as("k"))
        AsOf.asofJoin(purchases, clicks, "user_id", "ts", Seq("k"))
          .groupBy((col("asof_k") % 10).as("campaign"))
          .agg(count(lit(1)).as("n_purchases"),
               countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("campaign").asc_nulls_first)
      },
      Some("""WITH clicks AS (
             |  SELECT user_id, ts,
             |         CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS campaign
             |  FROM events WHERE event_type = 'click'),
             |purch AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
             |SELECT c.campaign, COUNT(*) AS n_purchases,
             |       COUNT(DISTINCT p.user_id) AS n_users
             |FROM purch p ASOF LEFT JOIN clicks c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin)),

    // ── Ordered conversion funnel (Windows.funnelStages): earliest
    //    strictly-sequenced view → click → purchase per user. Each stage is
    //    a conditional min joined against the per-user frontier — no window
    //    over the raw stream.
    ("funnel_stages",
      (spark, dir) =>
        Windows.funnelStages(Tables.events(spark, dir), "user_id", "ts",
                             "event_type", Seq("view", "click", "purchase"))
          .select(col("user_id"), col("t1").as("t_view"),
                  col("t2").as("t_click"), col("t3").as("t_purchase"))
          .orderBy(col("user_id")),
      Some("""WITH s1 AS (
             |  SELECT user_id, MIN(ts) AS t_view FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t_click
             |  FROM events e JOIN s1 USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts > s1.t_view GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t_purchase
             |  FROM events e JOIN s2 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click GROUP BY 1)
             |SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase
             |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // ── SCD2 status history (Windows.statusHistory): the event stream
    //    compressed to change-point runs with validity intervals — the
    //    slowly-changing-dimension type-2 build a warehouse runs on every
    //    dimension refresh. One shuffle on user_id for both window passes.
    ("status_history",
      (spark, dir) =>
        Windows.statusHistory(Tables.events(spark, dir), "user_id", "ts",
                              "event_type", col("event_id"))
          .orderBy(col("user_id"), col("run_no")),
      Some("""WITH marked AS (
             |  SELECT user_id, ts, event_id, event_type,
             |         CASE WHEN lag(event_type) OVER w IS NULL
             |               OR lag(event_type) OVER w <> event_type
             |              THEN 1 ELSE 0 END AS chg
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |runs0 AS (
             |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_no
             |  FROM marked),
             |runs AS (
             |  SELECT user_id, run_no, MIN(event_type) AS status,
             |         MIN(ts) AS valid_from, COUNT(*) AS n_events
             |  FROM runs0 GROUP BY 1, 2)
             |SELECT user_id, run_no, status, valid_from,
             |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_no) AS valid_to,
             |       n_events
             |FROM runs ORDER BY user_id, run_no""".stripMargin)),

    // ── HyperLogLog distinct sketch (Stats.hllDistinct) with exact
    //    register arithmetic: 256 registers built in ONE partial+final
    //    aggregate (shuffle = 256 rows at any input size — the
    //    approx_count_distinct machinery, opened up so every step hashes),
    //    indicator sum as an exact BIGINT numerator, the standard α·m²/Σ
    //    estimate + linear-counting branch, and the exact distinct count
    //    riding along as the accuracy column.
    ("hll_distinct_orders",
      (spark, dir) =>
        Stats.hllDistinct(Tables.lineitem(spark, dir), "l_orderkey"),
      Some("""WITH h AS (
             |  SELECT CAST(CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT) AS h
             |  FROM lineitem),
             |r AS (
             |  SELECT h // 4503599627370496 AS idx,
             |         53 - length(ltrim(lpad(bin(h % 4503599627370496), 52, '0'), '0')) AS rho
             |  FROM h),
             |regs AS (SELECT idx, MAX(rho) AS reg FROM r GROUP BY 1),
             |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nset,
             |             CAST(SUM(1::BIGINT << (53 - reg)) AS BIGINT) AS num FROM regs),
             |e AS (SELECT COUNT(DISTINCT l_orderkey) AS n_exact FROM lineitem),
             |c AS (
             |  SELECT nset, n_exact, 256 - nset AS zeros,
             |         (((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0) * 256.0 * 9007199254740992.0)
             |           / CAST(num + (256 - nset) * 9007199254740992 AS DOUBLE) AS raw
             |  FROM s CROSS JOIN e),
             |f AS (
             |  SELECT nset, n_exact,
             |         CASE WHEN raw <= 640.0 AND zeros > 0
             |              THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE))
             |              ELSE raw END AS est
             |  FROM c)
             |SELECT CAST(256 AS BIGINT) AS m, nset AS n_registers_set,
             |       round(est, 6) AS hll_estimate, n_exact,
             |       round(abs(est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 6) AS rel_err
             |FROM f""".stripMargin)),

    // ── HLL SHARD MERGE (Stats.hllMergeShards): the mergeability that
    //    makes the sketch the 100 TB distinct-count machinery — registers
    //    built independently per shard, unioned by per-register MAX, the
    //    merged estimate identical to the single-pass one because idx/rho
    //    are pure functions of the key. The deployment shape (per-shard
    //    sketch → merge → estimate) runs end to end and the merged
    //    ESTIMATE is hash-pinned; StatsSpec asserts merge ≡ single-pass.
    ("hll_shard_merge",
      (spark, dir) =>
        Stats.hllMergeShards(Tables.lineitem(spark, dir),
                             "l_orderkey", "l_returnflag"),
      Some("""WITH h AS (
             |  SELECT l_returnflag AS shard,
             |         CAST(CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT) AS h
             |  FROM lineitem),
             |r AS (
             |  SELECT shard, h // 4503599627370496 AS idx,
             |         53 - length(ltrim(lpad(bin(h % 4503599627370496), 52, '0'), '0')) AS rho
             |  FROM h),
             |ps AS (SELECT shard, idx, MAX(rho) AS reg FROM r GROUP BY 1, 2),
             |mg AS (SELECT idx, MAX(reg) AS reg FROM ps GROUP BY 1),
             |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nset,
             |             CAST(SUM(1::BIGINT << (53 - reg)) AS BIGINT) AS num FROM mg),
             |sh AS (SELECT CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards FROM ps),
             |c AS (
             |  SELECT n_shards, nset, 256 - nset AS zeros,
             |         (((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0) * 256.0 * 9007199254740992.0)
             |           / CAST(num + (256 - nset) * 9007199254740992 AS DOUBLE) AS raw
             |  FROM s CROSS JOIN sh),
             |f AS (
             |  SELECT n_shards, nset,
             |         CASE WHEN raw <= 640.0 AND zeros > 0
             |              THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE))
             |              ELSE raw END AS est
             |  FROM c)
             |SELECT n_shards, CAST(256 AS BIGINT) AS m, nset AS n_registers_set,
             |       round(est, 6) AS hll_estimate
             |FROM f""".stripMargin)),

    // ── MERGEABLE QUANTILE SKETCH, shard-merged (Stats.quantileSketchMerge):
    //    hash-coordinated bottom-k sampling — per-shard bottom-256 packed
    //    (hash32, cents) registers, merged by re-taking bottom-k, quantiles
    //    read from the merged sample at rank ⌈q·m⌉ with the exact rank
    //    quantiles riding along (value-histogram grid). Registers are
    //    order-independent exact BIGINTs, so sketch contents AND estimates
    //    hash-match the relational twin; StatsSpec pins merge ≡ single-pass.
    //    Quantile literals are DOUBLE on both sides — a DECIMAL q would
    //    ceil(0.1·30) to 3 where double's 3.0000000000000004 ceils to 4.
    ("quantile_sketch_merge",
      (spark, dir) =>
        Stats.quantileSketchMerge(Tables.lineitem(spark, dir),
          concat(col("l_orderkey").cast("string"), lit("-"),
                 col("l_linenumber").cast("string")),
          Scalars.moneyCents(col("l_extendedprice")),
          col("l_returnflag")),
      Some("""WITH b AS (
             |  SELECT l_returnflag AS shard,
             |         CAST(CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT) AS h,
             |         CAST(round(l_extendedprice * 100) AS BIGINT) AS v
             |  FROM lineitem),
             |r AS (SELECT shard, (h // 268435456) * 2147483648 + v AS reg FROM b),
             |ps AS (SELECT shard, reg FROM (
             |         SELECT shard, reg,
             |                row_number() OVER (PARTITION BY shard ORDER BY reg) AS rn
             |         FROM r) WHERE rn <= 256),
             |mg AS (SELECT reg FROM ps ORDER BY reg LIMIT 256),
             |vals AS (SELECT v, row_number() OVER (ORDER BY v) AS rk
             |         FROM (SELECT reg % 2147483648 AS v FROM mg)),
             |st AS (SELECT CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
             |              CAST(COUNT(*) AS BIGINT) AS n_rows FROM b),
             |sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM mg),
             |grid AS (SELECT v, CAST(SUM(COUNT(*)) OVER (ORDER BY v) AS BIGINT) AS cum
             |         FROM b GROUP BY v),
             |qq AS (SELECT CAST(q AS DOUBLE) AS q
             |       FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) AS t(q)),
             |ex AS (SELECT q, MIN(CASE WHEN cum >= greatest(1, CAST(ceil(q * n_rows) AS BIGINT))
             |                          THEN v END) AS exact_value
             |       FROM qq CROSS JOIN st CROSS JOIN grid GROUP BY q),
             |est AS (SELECT q, v AS est_value
             |        FROM qq CROSS JOIN sm
             |        JOIN vals ON vals.rk = greatest(1, CAST(ceil(q * m) AS BIGINT)))
             |SELECT qq.q, CAST(256 AS BIGINT) AS sketch_k, st.n_shards,
             |       st.n_rows, sm.m AS sample_m, est.est_value, ex.exact_value,
             |       abs(est.est_value - ex.exact_value) AS abs_err,
             |       CASE WHEN ex.exact_value = 0 THEN NULL
             |            ELSE round(CAST(abs(est.est_value - ex.exact_value) AS DOUBLE)
             |                       / CAST(ex.exact_value AS DOUBLE), 6) END AS rel_err
             |FROM qq CROSS JOIN st CROSS JOIN sm
             |JOIN est ON est.q = qq.q JOIN ex ON ex.q = qq.q
             |ORDER BY qq.q""".stripMargin)),

    // ── Count–Min Sketch heavy hitters (Stats.cmsTopTokens): d=4 × w=1024
    //    deterministic md5 counter matrix in ONE partial+final aggregate
    //    (sketch size constant at any corpus size; shards merge by counter
    //    addition), min-of-rows estimate as a map-side projection against
    //    the driver-held table, top-20 by (estimate desc, token) with the
    //    exact count riding along — overcount ≥ 0 is the CMS one-sided
    //    error guarantee, spec-asserted. The twin rebuilds the counter
    //    matrix and min-lookup relationally.
    ("cms_heavy_hitters",
      (spark, dir) =>
        Stats.cmsTopTokens(Tables.documents(spark, dir)),
      Some {
        def bk(r: Int, of: String = "token") =
          s"CAST(CAST('0x' || substr(md5('cms$r:' || $of), 1, 12) AS UBIGINT) AS BIGINT) % 1024"
        s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
           |bk AS (
           |  SELECT token, ${bk(0)} AS b0, ${bk(1)} AS b1,
           |         ${bk(2)} AS b2, ${bk(3)} AS b3
           |  FROM tok),
           |cms0 AS (SELECT b0 AS b, COUNT(*) AS c FROM bk GROUP BY 1),
           |cms1 AS (SELECT b1 AS b, COUNT(*) AS c FROM bk GROUP BY 1),
           |cms2 AS (SELECT b2 AS b, COUNT(*) AS c FROM bk GROUP BY 1),
           |cms3 AS (SELECT b3 AS b, COUNT(*) AS c FROM bk GROUP BY 1),
           |vocab0 AS (
           |  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count
           |  FROM tok GROUP BY 1),
           |vocab AS (
           |  SELECT token, exact_count,
           |         ${bk(0)} AS b0, ${bk(1)} AS b1, ${bk(2)} AS b2, ${bk(3)} AS b3
           |  FROM vocab0),
           |est AS (
           |  SELECT v.token, v.exact_count,
           |         least(c0.c, c1.c, c2.c, c3.c) AS cms_estimate
           |  FROM vocab v
           |  JOIN cms0 c0 ON c0.b = v.b0
           |  JOIN cms1 c1 ON c1.b = v.b1
           |  JOIN cms2 c2 ON c2.b = v.b2
           |  JOIN cms3 c3 ON c3.b = v.b3)
           |SELECT token, cms_estimate, exact_count,
           |       cms_estimate - exact_count AS overcount
           |FROM est ORDER BY cms_estimate DESC, token LIMIT 20""".stripMargin
      }),

    // ── KMV / theta-sketch set-overlap estimate (Stats.kmvOverlap): the
    //    bottom-256 key hashes per side estimate each side's distinct
    //    count ((k−1)·2⁶⁰/h_k), and both-membership within the union's
    //    bottom-k estimates Jaccard → intersection. Orders containing
    //    returned ('R') vs accepted ('A') lines; exact counts ride along.
    //    Bottom-k of a set is order-independent, so sketch contents AND
    //    estimates hash-match the relational twin.
    ("kmv_order_overlap",
      (spark, dir) =>
        Stats.kmvOverlapWhere(Tables.lineitem(spark, dir), "l_orderkey",
                              col("l_returnflag") === "R",
                              col("l_returnflag") === "A", k = 256),
      Some {
        val h = "CAST(CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT)"
        s"""WITH ka AS (SELECT DISTINCT $h AS h FROM lineitem WHERE l_returnflag = 'R'),
           |kb AS (SELECT DISTINCT $h AS h FROM lineitem WHERE l_returnflag = 'A'),
           |mem AS (
           |  SELECT h, MAX(a) AS in_a, MAX(b) AS in_b FROM (
           |    SELECT h, 1 AS a, 0 AS b FROM ka
           |    UNION ALL SELECT h, 0, 1 FROM kb) GROUP BY h),
           |tku AS (SELECT h FROM mem ORDER BY h LIMIT 256),
           |tka AS (SELECT h FROM mem WHERE in_a = 1 ORDER BY h LIMIT 256),
           |tkb AS (SELECT h FROM mem WHERE in_b = 1 ORDER BY h LIMIT 256),
           |tkboth AS (SELECT h FROM mem WHERE in_a = 1 AND in_b = 1 ORDER BY h LIMIT 256),
           |ex AS (SELECT CAST(SUM(in_a) AS BIGINT) AS n_a, CAST(SUM(in_b) AS BIGINT) AS n_b,
           |              CAST(SUM(in_a * in_b) AS BIGINT) AS n_both FROM mem),
           |ea AS (SELECT COUNT(*) AS c, MAX(h) AS mx FROM tka),
           |eb AS (SELECT COUNT(*) AS c, MAX(h) AS mx FROM tkb),
           |eu AS (SELECT COUNT(*) AS c, MAX(h) AS mx FROM tku),
           |ebo AS (SELECT COUNT(*) AS c FROM tku JOIN tkboth USING (h)),
           |f AS (
           |  SELECT CAST(256 AS BIGINT) AS k,
           |         ex.n_a AS n_a_exact, ex.n_b AS n_b_exact, ex.n_both AS n_both_exact,
           |         CASE WHEN ea.c < 256 THEN CAST(ex.n_a AS DOUBLE)
           |              ELSE round(255.0 * 1152921504606846976.0 / CAST(ea.mx AS DOUBLE), 6) END AS est_a,
           |         CASE WHEN eb.c < 256 THEN CAST(ex.n_b AS DOUBLE)
           |              ELSE round(255.0 * 1152921504606846976.0 / CAST(eb.mx AS DOUBLE), 6) END AS est_b,
           |         CASE WHEN eu.c < 256 THEN CAST(ex.n_a + ex.n_b - ex.n_both AS DOUBLE)
           |              ELSE round(255.0 * 1152921504606846976.0 / CAST(eu.mx AS DOUBLE), 6) END AS est_union,
           |         round(CAST(ebo.c AS DOUBLE) / CAST(least(eu.c, 256) AS DOUBLE), 6) AS jaccard_est
           |  FROM ex CROSS JOIN ea CROSS JOIN eb CROSS JOIN eu CROSS JOIN ebo)
           |SELECT k, n_a_exact, n_b_exact, n_both_exact, est_a, est_b, est_union,
           |       jaccard_est, round(jaccard_est * est_union, 6) AS est_intersection
           |FROM f""".stripMargin
      }),

    // ── Grouped Pearson correlation + OLS slope with exact BIGINT moment
    //    sums (Stats.pearsonOlsFixed): Spark's own corr() aggregates
    //    doubles in partition order and cannot hash-match an oracle; the
    //    fixed-point moments can. quantity vs price cents per brand over
    //    the broadcast part dimension.
    ("brand_corr_stats",
      (spark, dir) => {
        val li = Tables.lineitem(spark, dir)
          .join(broadcast(Tables.part(spark, dir)
                  .select(col("p_partkey"), col("p_brand").as("brand"))),
                col("l_partkey") === col("p_partkey"))
        Stats.pearsonOlsFixed(li, Seq("brand"),
            col("l_quantity").cast("long"),
            Scalars.moneyCents(col("l_extendedprice")))
          .withColumnRenamed("slope", "slope_cents")
          .orderBy(col("brand"))
      },
      Some("""WITH s AS (
             |  SELECT p_brand AS brand, COUNT(*) AS n,
             |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             |         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy,
             |         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
             |         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             |                  * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS syy,
             |         CAST(SUM(CAST(l_quantity AS BIGINT)
             |                  * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxy
             |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1)
             |SELECT brand, n,
             |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
             |         OR (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0
             |       THEN NULL
             |       ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |            / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |             * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             |  END AS corr,
             |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
             |       THEN NULL
             |       ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             |  END AS slope_cents
             |FROM s ORDER BY brand""".stripMargin)),

    // ── Edit-distance rescore of LSH candidates: the precision stage after
    //    banding — exact char-level Levenshtein similarity over the
    //    LSH-bounded pair set (Dedup.editDistanceRescore). 0.8 cleanly
    //    separates the corpus's planted near-dups (sim ≥ 0.93) from
    //    background band collisions (≤ 0.35).
    ("editdist_rescore",
      (spark, dir) =>
        Dedup.editDistanceRescore(Tables.documents(spark, dir), 8, 2, 0.8)
          .orderBy(col("doc_a"), col("doc_b")),
      Some {
        val sigs = (0 until 8).map(i => s"${sqlMinhash(i)} AS s$i").mkString(", ")
        val bands = (0 until 4).map(i => s"md5(s${2 * i} || '|' || s${2 * i + 1}) AS b$i").mkString(", ")
        val joins = (0 until 4).map(i =>
          s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             |FROM bands a JOIN bands b ON a.b$i = b.b$i AND a.doc_id < b.doc_id""".stripMargin)
          .mkString("\nUNION\n")
        s"""WITH sigs AS (SELECT doc_id, $sigs FROM documents),
           |bands AS (SELECT doc_id, $bands FROM sigs),
           |pairs AS (SELECT DISTINCT doc_a, doc_b FROM ($joins)),
           |scored AS (
           |  SELECT p.doc_a, p.doc_b,
           |         CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
           |         ROUND(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
           |                     / GREATEST(len(a.text), len(b.text)), 6) AS edit_sim
           |  FROM pairs p
           |  JOIN documents a ON a.doc_id = p.doc_a
           |  JOIN documents b ON b.doc_id = p.doc_b)
           |SELECT doc_a, doc_b, edit_dist, edit_sim FROM scored
           |WHERE edit_sim >= 0.8 ORDER BY doc_a, doc_b""".stripMargin
      }),

    // ── Bucketed interval join (AsOf.priorWindowCounts): per error event,
    //    count same-user events in the prior 24 h, then roll up per user.
    //    Spark-side plan is the 2-bucket explode + equi-join — never the
    //    broadcast-nested-loop a naive range predicate would produce. The
    //    DuckDB twin uses its native IEJoin range join on the raw predicate.
    ("error_context_stats",
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        AsOf.priorWindowCounts(
            ev.filter(col("event_type") === "error")
              .select("event_id", "user_id", "ts"),
            ev, "user_id", "ts", "event_id", 86400L)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_errors"),
               sum(when(col("n_prior") > 0, 1L).otherwise(0L)).as("n_with_context"),
               sum(col("n_prior")).as("total_prior"),
               max(col("n_prior")).as("max_prior"))
          .orderBy(col("user_id"))
      },
      Some("""WITH err AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
             |ctx AS (
             |  SELECT e.event_id, e.user_id, COUNT(c.event_id) AS n_prior
             |  FROM err e LEFT JOIN events c
             |    ON c.user_id = e.user_id
             |   AND epoch_us(c.ts) >= epoch_us(e.ts) - 86400000000
             |   AND epoch_us(c.ts) < epoch_us(e.ts)
             |  GROUP BY 1, 2)
             |SELECT user_id, COUNT(*) AS n_errors,
             |       CAST(SUM(CASE WHEN n_prior > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_context,
             |       CAST(SUM(n_prior) AS BIGINT) AS total_prior,
             |       CAST(MAX(n_prior) AS BIGINT) AS max_prior
             |FROM ctx GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ── Fixed-iteration integer-exact PageRank (Graph.pagerankFixed) over
    //    the symmetrized customer–supplier bipartite graph from
    //    orders ⋈ lineitem — the iterative-graph capability (domain/source
    //    authority scoring in a crawl-curation pipeline has this exact
    //    shape). 3 damped rounds; BIGINT micro-unit ranks hash-match DuckDB.
    ("supplier_pagerank",
      (spark, dir) => {
        val eo = Tables.orders(spark, dir)
          .join(Tables.lineitem(spark, dir),
                col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
          .distinct()
        // node ids stay BIGINT (2c / 2s+1) through the iterations — long
        // joins beat string joins on the million-edge relation — and become
        // the oracle's 'c<k>'/'s<k>' labels only in the final 16 k-row
        // projection
        val edges = eo.select(explode(array(
            struct((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst")),
            struct((col("s") * 2 + 1).as("src"), (col("c") * 2).as("dst"))))
            .as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        Graph.pagerankFixed(edges, 3)
          .select(
            when(col("node") % 2 === 0, concat(lit("c"), expr("node div 2")))
              .otherwise(concat(lit("s"), expr("(node - 1) div 2")))
              .as("node"),
            col("rank"))
          .orderBy(col("rank").desc, col("node"))
      },
      Some {
        val round = (prev: String, next: String) =>
          s"""$next AS (SELECT e.dst AS node,
             |  CAST(150000000000 + (SUM(r.rank // d.d) * 85) // 100 AS BIGINT) AS rank
             |FROM edges e JOIN $prev r ON r.node = e.src
             |JOIN deg d ON d.src = e.src GROUP BY 1)""".stripMargin
        s"""WITH eo AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |edges AS (SELECT 'c' || c AS src, 's' || s AS dst FROM eo
           |  UNION ALL SELECT 's' || s, 'c' || c FROM eo),
           |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
           |r0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS rank FROM deg),
           |${round("r0", "r1")},
           |${round("r1", "r2")},
           |${round("r2", "r3")}
           |SELECT node, rank FROM r3 ORDER BY rank DESC, node""".stripMargin
      }),

    // ── Exact triangle census (Graph.triangleStats) of the co-supply
    //    graph: suppliers sharing ≥6 orders. Degree-ordered orientation
    //    (Suri–Vassilvitskii) bounds the wedge relation by m^1.5 — the
    //    distributed triangle shape — and the support prune is the standard
    //    market-basket densification guard. One audit row: counts + global
    //    clustering coefficient.
    ("cosupply_triangles",
      (spark, dir) =>
        Graph.triangleStats(Tables.lineitem(spark, dir),
                            "l_orderkey", "l_suppkey", minSupport = 6),
      Some("""WITH ds AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS it FROM lineitem),
             |e AS (
             |  SELECT a.it AS u, b.it AS v
             |  FROM ds a JOIN ds b ON a.bk = b.bk AND a.it < b.it
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 6),
             |deg AS (
             |  SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
             |    SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
             |o AS (
             |  SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS src,
             |         CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS dst,
             |         CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS dd
             |  FROM (SELECT e.u, e.v, d1.d AS du, d2.d AS dv
             |        FROM e JOIN deg d1 ON d1.x = e.u JOIN deg d2 ON d2.x = e.v)),
             |w AS (
             |  SELECT e1.dst AS wa, e2.dst AS wb
             |  FROM o e1 JOIN o e2 ON e1.src = e2.src
             |   AND (e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst))),
             |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
             |      FROM w JOIN o ON w.wa = o.src AND w.wb = o.dst),
             |nw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             |              CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
             |ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
             |SELECT n_nodes, n_edges, n_wedges, n_triangles,
             |       round(3.0 * n_triangles / NULLIF(n_wedges, 0), 6) AS clustering
             |FROM nw CROSS JOIN ec CROSS JOIN t""".stripMargin)),

    // ── Mergeable histogram quantiles (Stats.histogramQuantiles): p50/p90/
    //    p99 of order value per priority from a 1024-bin fixed-width
    //    histogram — two bounded aggregate passes, integer-exact bin
    //    assignment on money cents, doubles only in the final interpolation
    //    (shape mirrored by the twin operator-for-operator). The scalable
    //    quantile path; the spec bounds estimate error by one bin width
    //    against exact percentiles.
    ("price_histogram_quantiles",
      (spark, dir) =>
        Stats.histogramQuantiles(
            Tables.orders(spark, dir)
              .withColumnRenamed("o_orderpriority", "priority"),
            Seq("priority"), Scalars.moneyCents(col("o_totalprice"))),
      Some("""WITH base AS (
             |  SELECT o_orderpriority AS priority,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
             |b AS (SELECT priority, MIN(c) AS lo, MAX(c) AS hi,
             |             CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY 1),
             |bins AS (
             |  SELECT base.priority, ((c - lo) * 1024) // (hi - lo + 1) AS bin
             |  FROM base JOIN b ON b.priority = base.priority),
             |cnt AS (SELECT priority, bin, CAST(COUNT(*) AS BIGINT) AS cnt
             |        FROM bins GROUP BY 1, 2),
             |cum AS (
             |  SELECT priority, bin, cnt,
             |         CAST(SUM(cnt) OVER (PARTITION BY priority ORDER BY bin) AS BIGINT) AS cum
             |  FROM cnt),
             |q AS (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS q),
             |pick AS (
             |  SELECT c.priority, q.q, MIN(c.bin) AS bin
             |  FROM cum c JOIN b ON b.priority = c.priority CROSS JOIN q
             |  WHERE c.cum >= q.q * b.n GROUP BY 1, 2),
             |pk AS (
             |  SELECT p.priority, p.q, p.bin, c.cnt, c.cum
             |  FROM pick p JOIN cum c ON c.priority = p.priority AND c.bin = p.bin),
             |est AS (
             |  SELECT pk.priority, pk.q,
             |         round((lo + (hi - lo + 1) / 1024.0
             |                * (pk.bin + (pk.q * n - (pk.cum - pk.cnt)) / pk.cnt))
             |               / 100.0, 6) AS est
             |  FROM pk JOIN b ON b.priority = pk.priority)
             |SELECT e.priority, MAX(b.n) AS n, MAX(b.lo) AS min_cents,
             |       MAX(b.hi) AS max_cents,
             |       MAX(CASE WHEN q = 0.5 THEN est END) AS p50_est,
             |       MAX(CASE WHEN q = 0.9 THEN est END) AS p90_est,
             |       MAX(CASE WHEN q = 0.99 THEN est END) AS p99_est
             |FROM est e JOIN b ON b.priority = e.priority
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ── Calendar gap-fill (Windows.calendarFill): the resample step —
    //    every day in the global span × every priority, zero-filled, with
    //    running totals. 1,094 of 2,405 span days have orders at sf0.001:
    //    the fill is structural, not decorative. Grid and aggregated counts
    //    are wall-clock-bounded → both sides broadcast; the corpus pays one
    //    partial+final aggregate.
    ("orders_daily_gapfill",
      (spark, dir) =>
        Windows.calendarFill(Tables.orders(spark, dir),
                             "o_orderpriority", to_date(col("o_orderdate")))
          .withColumnRenamed("g", "priority")
          .orderBy(col("priority"), col("day")),
      Some("""WITH d AS (SELECT o_orderpriority AS priority,
             |                 CAST(o_orderdate AS DATE) AS day FROM orders),
             |c AS (SELECT priority, day, CAST(COUNT(*) AS BIGINT) AS n
             |      FROM d GROUP BY 1, 2),
             |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
             |cal AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
             |        FROM b),
             |g AS (SELECT DISTINCT priority FROM d),
             |f AS (
             |  SELECT g.priority, cal.day, COALESCE(c.n, 0) AS n
             |  FROM g CROSS JOIN cal
             |  LEFT JOIN c ON c.priority = g.priority AND c.day = cal.day)
             |SELECT priority, day, n,
             |       CAST(SUM(n) OVER (PARTITION BY priority ORDER BY day) AS BIGINT) AS cum_n
             |FROM f ORDER BY 1, 2""".stripMargin)),

    // ── Per-column data-quality profile (Profile.columnProfile) of orders:
    //    nulls, exact distincts, typed min/max — ONE scan (the distinct
    //    faces expand it 6-fold in-plan; the 100 TB swap is the HLL face per
    //    column). Canonicalization makes the report engine-exact: money →
    //    cents, timestamps → dates, min/max stringified only at the end.
    ("orders_column_profile",
      (spark, dir) =>
        Profile.columnProfile(Tables.orders(spark, dir), Seq(
          ("o_orderkey", col("o_orderkey"), col("o_orderkey")),
          ("o_custkey", col("o_custkey"), col("o_custkey")),
          ("o_orderstatus", col("o_orderstatus"), col("o_orderstatus")),
          ("o_totalprice", col("o_totalprice"),
            Scalars.moneyCents(col("o_totalprice"))),
          ("o_orderdate", col("o_orderdate"), to_date(col("o_orderdate"))),
          ("o_orderpriority", col("o_orderpriority"), col("o_orderpriority")))),
      Some {
        def block(nm: String, canon: String) =
          s"""SELECT '$nm' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |       CAST(COUNT(*) - COUNT($nm) AS BIGINT) AS n_nulls,
             |       CAST(COUNT(DISTINCT $canon) AS BIGINT) AS n_distinct,
             |       CAST(MIN($canon) AS VARCHAR) AS min_val,
             |       CAST(MAX($canon) AS VARCHAR) AS max_val
             |FROM orders""".stripMargin
        Seq(
          block("o_orderkey", "o_orderkey"),
          block("o_custkey", "o_custkey"),
          block("o_orderstatus", "o_orderstatus"),
          block("o_totalprice", "CAST(round(o_totalprice * 100) AS BIGINT)"),
          block("o_orderdate", "CAST(o_orderdate AS DATE)"),
          block("o_orderpriority", "o_orderpriority"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
      }),

    // ── Heaps'-law vocabulary growth (TextAnalysis.vocabGrowthCurve):
    //    distinct-token count and type/token ratio at ten corpus prefixes —
    //    does more data still buy vocabulary? Integer-exact via the
    //    first-owner index (MIN doc_id per token): one corpus scan, every
    //    per-decile count joins the tiny side.
    ("vocab_growth_curve",
      (spark, dir) =>
        TextAnalysis.vocabGrowthCurve(Tables.documents(spark, dir)),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |            FROM documents),
             |mx AS (SELECT MAX(doc_id) AS mx FROM documents),
             |th AS (SELECT i AS decile, (i * mx) // 10 AS t
             |       FROM (SELECT unnest(range(1, 11)) AS i) CROSS JOIN mx),
             |inv AS (SELECT token, MIN(doc_id) AS fd FROM tok GROUP BY 1),
             |dt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt FROM tok GROUP BY 1),
             |seen AS (SELECT decile, t, CAST(SUM(nt) AS BIGINT) AS n_tokens_seen
             |         FROM dt JOIN th ON dt.doc_id <= th.t GROUP BY 1, 2),
             |voc AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS vocab_size
             |        FROM inv JOIN th ON inv.fd <= th.t GROUP BY 1)
             |SELECT s.decile, s.t AS doc_threshold, n_tokens_seen, vocab_size,
             |       round(CAST(vocab_size AS DOUBLE) / n_tokens_seen, 6) AS type_token_ratio
             |FROM seen s JOIN voc USING (decile) ORDER BY 1""".stripMargin)),

    // ── First-owner 3-gram novelty (TextAnalysis.ngramNoveltyScores): the
    //    fraction of each doc's distinct shingles unseen in any earlier
    //    doc — a memorization/curriculum signal. One inverted-index pass
    //    (postings → MIN owner → postings-bounded join back); the Spark
    //    side moves md5-hashed keys, the twin groups the strings — counts
    //    agree exactly absent 128-bit collisions.
    ("ngram_novelty_scores",
      (spark, dir) =>
        TextAnalysis.ngramNoveltyScores(Tables.documents(spark, dir))
          .orderBy(col("doc_id")),
      Some(s"""WITH sh AS (SELECT DISTINCT doc_id, g FROM (
              |  SELECT doc_id, unnest(${sqlShingles(3)}) AS g FROM documents)),
              |ow AS (SELECT g, MIN(doc_id) AS fd FROM sh GROUP BY 1),
              |ag AS (
              |  SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
              |         CAST(SUM(CASE WHEN ow.fd = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
              |  FROM sh JOIN ow USING (g) GROUP BY 1)
              |SELECT doc_id, n_shingles, n_novel,
              |       round(CAST(n_novel AS DOUBLE) / n_shingles, 6) AS novelty
              |FROM ag ORDER BY doc_id""".stripMargin)),

    // ── Bloom prescreen audit (Stats.bloomPrescreenStats): m=65536/k=4
    //    md5 Bloom over order-placing customers, probed by the
    //    incremental-ingest shape — every known customer key PLUS an
    //    equal-size max-shifted unseen batch (the synthetic tables have no
    //    natural non-members: every FK domain is fully covered, so the
    //    unseen half is constructed, exactly what a reconcile prescreen
    //    sees from a new ingest). Exact occupancy, pass counts, measured
    //    false-positive rate vs ground truth. The PRODUCTION prescreen is
    //    the native XXH64 bloomAgg; this audit face is the sizing check,
    //    with the bitmap shipped as a literal (the centroid pattern) so
    //    probes are map-side bit arithmetic.
    ("bloom_prescreen_stats",
      (spark, dir) => {
        val cust = Tables.customer(spark, dir).select(col("c_custkey").as("cust"))
        val mx = cust.agg(max(col("cust")).as("mx"))
        val probe = cust.unionAll(
          cust.crossJoin(broadcast(mx)).select((col("cust") + col("mx")).as("cust")))
        Stats.bloomPrescreenStats(
          Tables.orders(spark, dir).select(col("o_custkey").as("cust")),
          probe, "cust")
      },
      Some {
        def bit(r: Int, of: String) =
          s"CAST(CAST('0x' || substr(md5('bf$r:' || CAST($of AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT) % 65536"
        s"""WITH bk AS (SELECT DISTINCT o_custkey AS key FROM orders
           |            WHERE o_custkey IS NOT NULL),
           |bh AS (SELECT DISTINCT bit FROM (
           |  SELECT unnest([${(0 until 4).map(r => bit(r, "key")).mkString(", ")}]) AS bit
           |  FROM bk)),
           |bs AS (SELECT CAST(COUNT(*) AS BIGINT) AS bits_set FROM bh),
           |nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_build_keys FROM bk),
           |mx AS (SELECT MAX(c_custkey) AS mx FROM customer),
           |pk AS (SELECT DISTINCT key FROM (
           |  SELECT c_custkey AS key FROM customer
           |  UNION ALL
           |  SELECT c_custkey + mx FROM customer CROSS JOIN mx)
           |  WHERE key IS NOT NULL),
           |pp AS (SELECT key, ${(0 until 4).map(r => s"${bit(r, "key")} AS b$r").mkString(", ")}
           |       FROM pk),
           |fl AS (SELECT key,
           |         CASE WHEN b0 IN (SELECT bit FROM bh) AND b1 IN (SELECT bit FROM bh)
           |               AND b2 IN (SELECT bit FROM bh) AND b3 IN (SELECT bit FROM bh)
           |              THEN 1 ELSE 0 END AS p,
           |         CASE WHEN key IN (SELECT key FROM bk) THEN 1 ELSE 0 END AS t
           |       FROM pp),
           |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
           |              CAST(SUM(p) AS BIGINT) AS n_pass,
           |              CAST(SUM(t) AS BIGINT) AS n_members,
           |              CAST(SUM(p * (1 - t)) AS BIGINT) AS n_false_pos FROM fl)
           |SELECT CAST(65536 AS BIGINT) AS m, CAST(4 AS BIGINT) AS k,
           |       n_build_keys, bits_set, n_probes, n_pass, n_members, n_false_pos,
           |       round(CAST(n_false_pos AS DOUBLE) / NULLIF(n_probes - n_members, 0), 6) AS fp_rate
           |FROM ag CROSS JOIN nk CROSS JOIN bs""".stripMargin
      }),

    // ── Rendezvous/HRW routing audit (Layout.rendezvousMoveAudit): route
    //    every document by highest-random-weight over 8 shards and again
    //    over 9, report balance and movement — the minimal-disruption
    //    property (~1/9 of keys move; a mod-N map reshuffles ~8/9). Shard
    //    argmax is a map-side literal-struct array_max; the corpus reduces
    //    to an 8×9 cell matrix in one aggregate.
    ("rendezvous_shard_moves",
      (spark, dir) =>
        Layout.rendezvousMoveAudit(Tables.documents(spark, dir), "doc_id", 8, 9),
      Some {
        val h = "CAST(CAST('0x' || substr(md5('rv' || s || ':' || CAST(k AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT)"
        s"""WITH ky AS (SELECT doc_id AS k FROM documents WHERE doc_id IS NOT NULL),
           |g AS (SELECT k, s, $h AS h
           |      FROM ky CROSS JOIN (SELECT unnest(range(9)) AS s)),
           |mx8 AS (SELECT k, MAX(h) AS mh FROM g WHERE s < 8 GROUP BY k),
           |a8 AS (SELECT g.k, CAST(MIN(g.s) AS BIGINT) AS sf
           |       FROM g JOIN mx8 ON g.k = mx8.k AND g.h = mx8.mh
           |       WHERE g.s < 8 GROUP BY g.k),
           |mx9 AS (SELECT k, MAX(h) AS mh FROM g GROUP BY k),
           |a9 AS (SELECT g.k, CAST(MIN(g.s) AS BIGINT) AS st
           |       FROM g JOIN mx9 ON g.k = mx9.k AND g.h = mx9.mh GROUP BY g.k),
           |c AS (SELECT sf, st, CAST(COUNT(*) AS BIGINT) AS n
           |      FROM a8 JOIN a9 ON a8.k = a9.k GROUP BY 1, 2),
           |mv AS (SELECT CAST(SUM(n) AS BIGINT) AS n_keys,
           |              CAST(SUM(CASE WHEN sf <> st THEN n ELSE 0 END) AS BIGINT) AS moved
           |       FROM c),
           |bf AS (SELECT CAST(MIN(sn) AS BIGINT) AS min_from, CAST(MAX(sn) AS BIGINT) AS max_from
           |       FROM (SELECT sf, SUM(n) AS sn FROM c GROUP BY 1)),
           |bt AS (SELECT CAST(MIN(sn) AS BIGINT) AS min_to, CAST(MAX(sn) AS BIGINT) AS max_to
           |       FROM (SELECT st, SUM(n) AS sn FROM c GROUP BY 1))
           |SELECT CAST(8 AS BIGINT) AS n_shards_from, CAST(9 AS BIGINT) AS n_shards_to,
           |       n_keys, moved, round(CAST(moved AS DOUBLE) / n_keys, 6) AS move_frac,
           |       min_from, max_from, min_to, max_to
           |FROM mv CROSS JOIN bf CROSS JOIN bt""".stripMargin
      }),

    // ── Median/MAD volume anomalies (Stats.madDailyOutliers): robust
    //    outlier flags over daily order counts per priority. Median buffers
    //    bound by calendar days, not rows; interpolated halves of integers
    //    keep every double exact across engines.
    ("order_volume_outliers",
      (spark, dir) =>
        Stats.madDailyOutliers(Tables.orders(spark, dir),
                               "o_orderpriority", to_date(col("o_orderdate")))
          .withColumnRenamed("g", "priority")
          .orderBy(col("priority"), col("day")),
      Some("""WITH d AS (SELECT o_orderpriority AS priority,
             |                 CAST(o_orderdate AS DATE) AS day FROM orders),
             |dc AS (SELECT priority, day, CAST(COUNT(*) AS BIGINT) AS n
             |       FROM d GROUP BY 1, 2),
             |m AS (SELECT priority, quantile_cont(n, 0.5) AS med FROM dc GROUP BY 1),
             |dv AS (SELECT dc.priority, day, n, med, abs(n - med) AS dev
             |       FROM dc JOIN m ON m.priority = dc.priority),
             |md AS (SELECT priority, quantile_cont(dev, 0.5) AS mad,
             |              avg(dev) AS avg_dev FROM dv GROUP BY 1),
             |sc AS (SELECT priority, mad,
             |              CASE WHEN mad > 0 THEN 1.4826 * mad
             |                   ELSE 1.2533 * avg_dev END AS scale FROM md)
             |SELECT dv.priority, day, n, med, sc.mad, sc.scale,
             |       CASE WHEN sc.scale > 0 AND dev > 3.0 * sc.scale THEN 1 ELSE 0
             |       END AS is_outlier
             |FROM dv JOIN sc ON sc.priority = dv.priority
             |ORDER BY 1, 2""".stripMargin)),

    // ── Benford first-digit audit (Stats.benfordDigitAudit) over order
    //    amounts in cents: exact per-digit counts from the decimal string
    //    (no float log extraction), expected share and deviation in ppm.
    //    Nine-group aggregate — the shuffle is nine rows per task at any
    //    scale.
    ("benford_amount_audit",
      (spark, dir) =>
        Stats.benfordDigitAudit(Tables.orders(spark, dir),
                                Scalars.moneyCents(col("o_totalprice"))),
      Some("""WITH a AS (SELECT substr(CAST(abs(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR), 1, 1) AS digit
             |           FROM orders),
             |o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
             |      FROM a WHERE digit <> '0' GROUP BY 1),
             |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM o)
             |SELECT digit, n_obs,
             |       CAST(round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1e6) AS BIGINT) AS expected_ppm,
             |       CAST(round((CAST(n_obs AS DOUBLE) / n
             |                   - log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) * 1e6) AS BIGINT) AS deviation_ppm
             |FROM o CROSS JOIN t ORDER BY digit""".stripMargin)),

    // ── Inter-arrival burstiness (Stats.burstiness): per-user
    //    (σ−μ)/(σ+μ) over integer-second gaps. The floored-seconds gap
    //    sequence is tie-break-invariant (any sort compatible with the
    //    non-decreasing floored values yields the same sequence), so the
    //    twin's (s, event_id) window order and Spark's (ts, event_id)
    //    order produce identical exact moment sums.
    ("user_burstiness",
      (spark, dir) =>
        Stats.burstiness(Tables.events(spark, dir)).orderBy(col("user_id")),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS s, event_id
             |           FROM events),
             |q AS (SELECT user_id,
             |             s - lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id) AS d
             |      FROM e),
             |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             |             CAST(SUM(d) AS BIGINT) AS sd,
             |             CAST(SUM(d * d) AS BIGINT) AS sd2
             |      FROM q WHERE d IS NOT NULL GROUP BY 1),
             |m AS (SELECT user_id, n_gaps, sd,
             |             CAST(sd AS DOUBLE) / n_gaps AS mean,
             |             sqrt(CAST(sd2 AS DOUBLE) / n_gaps
             |                  - (CAST(sd AS DOUBLE) / n_gaps) * (CAST(sd AS DOUBLE) / n_gaps)) AS sig
             |      FROM a)
             |SELECT user_id, n_gaps,
             |       round(CAST(sd AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
             |       round(CASE WHEN sig + mean > 0 THEN (sig - mean) / (sig + mean) END, 6) AS burstiness
             |FROM m ORDER BY user_id""".stripMargin)),

    // ── Zipf rank–frequency slope (TextAnalysis.zipfRankSlope): OLS of
    //    ln-frequency on ln-rank over the top-1000 vocabulary head, moment
    //    sums exact in micro-nat BIGINTs, slope/intercept/r² as mirrored
    //    final-projection doubles.
    ("zipf_rank_slope",
      (spark, dir) =>
        TextAnalysis.zipfRankSlope(Tables.documents(spark, dir), 1000),
      Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
             |ct AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1),
             |hd AS (SELECT c, row_number() OVER (ORDER BY c DESC, token ASC) AS rank
             |       FROM ct ORDER BY c DESC, token ASC LIMIT 1000),
             |pt AS (SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS x,
             |              CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS y
             |       FROM hd),
             |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |              CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             |              CAST(SUM(x * y) AS BIGINT) AS sxy,
             |              CAST(SUM(x * x) AS BIGINT) AS sx2,
             |              CAST(SUM(y * y) AS BIGINT) AS sy2 FROM pt),
             |f AS (SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             |             CAST(sy AS DOUBLE) AS syd,
             |             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
             |             CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
             |             CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
             |      FROM ag)
             |SELECT n AS n_terms, round(cov / vx, 6) AS slope,
             |       round((syd - (cov / vx) * sxd) / nd, 6) AS intercept_unats,
             |       round((cov / vx) * (cov / vy), 6) AS r2
             |FROM f""".stripMargin)),

    // ── Mutual-kNN graph audit (Similarity.knnGraphStats): k=5 exact
    //    cosine kNN over a FIXED-BUDGET deterministic sample — the 1000
    //    vectors with smallest md5(vec_id), i.e. a seedless uniform draw
    //    whose size does not grow with the corpus. An audit pays a fixed
    //    quadratic budget at any scale (measured: the earlier
    //    corpus-proportional slice ran 85 s at the 9× replica — quadratic
    //    exactly as designed, and exactly why a deployed audit samples);
    //    the full-corpus edge list composes from the IVF/LSH paths.
    //    Hubness probe: mutual-pair count plus mean rank-1/top-k cosines
    //    in exact micro-units.
    ("knn_mutual_graph",
      (spark, dir) =>
        Similarity.knnGraphStats(
          Tables.embeddings(spark, dir)
            .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
            .limit(Similarity.KnnAuditBudget), 5),
      Some("""WITH v AS (SELECT vec_id, embedding FROM embeddings
             |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1000),
             |sc AS (SELECT a.vec_id AS q_id, b.vec_id AS dst,
             |              round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
             |       FROM v a CROSS JOIN v b WHERE a.vec_id <> b.vec_id),
             |ed AS (SELECT q_id, dst, cos_sim,
             |              CAST(round(cos_sim * 1e6) AS BIGINT) AS cos_u
             |       FROM sc
             |       QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, dst) <= 5),
             |mu AS (SELECT CAST(COUNT(*) // 2 AS BIGINT) AS n_mutual_pairs
             |       FROM ed e1 JOIN ed e2 ON e1.q_id = e2.dst AND e1.dst = e2.q_id),
             |t1 AS (SELECT CAST(SUM(cos_u) AS BIGINT) AS s1,
             |              CAST(COUNT(*) AS BIGINT) AS n1 FROM (
             |         SELECT cos_u FROM ed
             |         QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, dst) = 1)),
             |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
             |              CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_nodes,
             |              CAST(SUM(cos_u) AS BIGINT) AS sk FROM ed)
             |SELECT n_nodes, n_edges, n_mutual_pairs,
             |       round(CAST(s1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * 1e6), 6) AS mean_top1_cos,
             |       round(CAST(sk AS DOUBLE) / (CAST(n_edges AS DOUBLE) * 1e6), 6) AS mean_topk_cos
             |FROM ag CROSS JOIN mu CROSS JOIN t1""".stripMargin)),

    // ── Key-skew profile (Skew.keySkewProfile) over the event stream's
    //    user key: Gini / top-1% share / Herfindahl from counts-of-counts
    //    with closed-form equal-count blocks — rank statistics without a
    //    global key sort; windows bounded by distinct count values.
    ("key_skew_profile",
      (spark, dir) =>
        Skew.keySkewProfile(Tables.events(spark, dir), "user_id"),
      Some("""WITH kc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
             |            FROM events GROUP BY 1),
             |cc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS k FROM kc GROUP BY 1),
             |b AS (SELECT c, k,
             |        COALESCE(SUM(k) OVER (ORDER BY c ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS kb,
             |        COALESCE(SUM(k) OVER (ORDER BY c DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS kt,
             |        SUM(k) OVER () AS nk
             |      FROM cc),
             |ag AS (SELECT CAST(MAX(nk) AS BIGINT) AS n_keys,
             |              CAST(SUM(k * c) AS BIGINT) AS n_rows,
             |              CAST(MAX(c) AS BIGINT) AS max_count,
             |              CAST(SUM(c * (((2 * kb + k + 1) * k) // 2)) AS BIGINT) AS s,
             |              CAST(SUM(c * c * k) AS BIGINT) AS sc2,
             |              CAST(SUM(LEAST(k, GREATEST((nk + 99) // 100 - kt, 0)) * c) AS BIGINT) AS top_rows
             |       FROM b)
             |SELECT n_keys, n_rows, max_count,
             |       round(2.0 * CAST(s AS DOUBLE) / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE))
             |             - CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE), 6) AS gini,
             |       round(CAST(top_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS top1pct_share,
             |       round(CAST(sc2 AS DOUBLE) / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)), 6) AS hhi
             |FROM ag""".stripMargin)),

    // ── MinHash estimator calibration (Dedup.minhashCalibration): exact
    //    shingle-set Jaccard vs the k=8 minhash estimate on every banding
    //    candidate pair, grouped by matching-component count — the "is k
    //    still big enough" audit next to the production LSH path. Exact
    //    side restricted to pair-docs before the inverted-index join;
    //    micro-unit sums.
    ("minhash_calibration",
      (spark, dir) =>
        Dedup.minhashCalibration(Tables.documents(spark, dir), 8, 2),
      Some {
        val sigs = (0 until 8).map(i => s"${sqlMinhash(i)} AS s$i").mkString(", ")
        val bands = (0 until 4).map(i => s"md5(s${2 * i} || '|' || s${2 * i + 1}) AS b$i").mkString(", ")
        val joins = (0 until 4).map(i =>
          s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             |FROM bands a JOIN bands b ON a.b$i = b.b$i AND a.doc_id < b.doc_id""".stripMargin)
          .mkString("\nUNION\n")
        val mexpr = (0 until 8)
          .map(i => s"(CASE WHEN sa.s$i = sb.s$i THEN 1 ELSE 0 END)").mkString(" + ")
        s"""WITH sigs AS (SELECT doc_id, $sigs FROM documents),
           |bands AS (SELECT doc_id, $bands FROM sigs),
           |cp AS (SELECT DISTINCT doc_a, doc_b FROM ($joins)),
           |mm AS (SELECT cp.doc_a, cp.doc_b, CAST($mexpr AS BIGINT) AS m
           |       FROM cp JOIN sigs sa ON sa.doc_id = cp.doc_a
           |               JOIN sigs sb ON sb.doc_id = cp.doc_b),
           |sh AS (SELECT DISTINCT doc_id, g FROM (
           |         SELECT doc_id, unnest(${sqlShingles(3)}) AS g FROM documents)),
           |pd AS (SELECT DISTINCT doc_id FROM (
           |         SELECT doc_a AS doc_id FROM cp
           |         UNION ALL SELECT doc_b FROM cp)),
           |ps AS (SELECT sh.doc_id, g FROM sh JOIN pd USING (doc_id)),
           |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM ps GROUP BY 1),
           |iv AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |              CAST(COUNT(*) AS BIGINT) AS shared
           |       FROM ps a JOIN ps b ON a.g = b.g AND a.doc_id < b.doc_id
           |       GROUP BY 1, 2),
           |pr AS (SELECT mm.m,
           |         CAST(round(CAST(shared AS DOUBLE) / (za.sz + zb.sz - shared) * 1e6) AS BIGINT) AS ju,
           |         CAST(round(abs(CAST(mm.m AS DOUBLE) / 8
           |              - CAST(shared AS DOUBLE) / (za.sz + zb.sz - shared)) * 1e6) AS BIGINT) AS eu
           |       FROM mm JOIN iv USING (doc_a, doc_b)
           |            JOIN sz za ON za.doc_id = mm.doc_a
           |            JOIN sz zb ON zb.doc_id = mm.doc_b)
           |SELECT m AS n_matching, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |       round(CAST(SUM(ju) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS mean_exact_jaccard,
           |       round(CAST(SUM(eu) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS mean_abs_err
           |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ── Cohen's-kappa gate agreement (Curation.labelAgreement): do the
    //    heuristic quality gate (quality_score > 0.5) and the NB
    //    classifier gate (logodds_unats > 0) agree beyond chance? The
    //    confusion cells are exact BIGINTs; po/pe/kappa derive from
    //    identical integers in any engine. One doc_id equi-join of the
    //    two scored relations, then a single keyless aggregate.
    ("quality_kappa",
      (spark, dir) => {
        val q = TextAnalysis.qualityColumns(col("text"))
        val heur = Tables.documents(spark, dir)
          .select(col("doc_id"), (q("quality_score") > lit(0.5)).as("__lh"))
        val nb = TextAnalysis.nbClassifierScores(Tables.documents(spark, dir),
            refLang = "en", vocabSize = 50)
          .select(col("doc_id"), (col("logodds_unats") > lit(0L)).as("__ln"))
        Curation.labelAgreement(heur.join(nb, Seq("doc_id")),
                                col("__lh"), col("__ln"))
      },
      Some(s"""WITH $sqlNbScoredCtes,
              |hf AS (
              |  SELECT doc_id,
              |         len($sqlTokens) AS n_tokens,
              |         len(list_distinct($sqlTokens)) AS n_distinct,
              |         length(replace(text, ' ', '')) AS n_chars,
              |         len(list_filter($sqlTokens, t -> list_contains($stopListSql, t))) AS stop_hits
              |  FROM documents),
              |hl AS (
              |  SELECT doc_id,
              |         (least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
              |          + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3
              |          + least((CAST(stop_hits AS DOUBLE) / n_tokens) * 5.0, 1.0) * 0.3) > 0.5 AS la
              |  FROM hf),
              |j AS (
              |  SELECT hl.la AS a, (nbdoc.logodds_unats > 0) AS b
              |  FROM hl JOIN nbdoc USING (doc_id)
              |  WHERE hl.la IS NOT NULL AND nbdoc.logodds_unats IS NOT NULL),
              |cf AS (
              |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
              |         CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_both_pos,
              |         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
              |         CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only,
              |         CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_both_neg
              |  FROM j),
              |k AS (
              |  SELECT n_docs, n_both_pos, n_a_only, n_b_only, n_both_neg,
              |         CAST(n_both_pos + n_both_neg AS DOUBLE) / CAST(n_docs AS DOUBLE) AS po,
              |         CAST(n_both_pos + n_a_only AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pa,
              |         CAST(n_both_pos + n_b_only AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pb
              |  FROM cf)
              |SELECT n_docs, n_both_pos, n_a_only, n_b_only, n_both_neg,
              |       round(po, 6) AS observed_agreement,
              |       round(pa * pb + (1.0 - pa) * (1.0 - pb), 6) AS chance_agreement,
              |       CASE WHEN 1.0 - (pa * pb + (1.0 - pa) * (1.0 - pb)) = 0
              |            THEN NULL
              |            ELSE round((po - (pa * pb + (1.0 - pa) * (1.0 - pb)))
              |                       / (1.0 - (pa * pb + (1.0 - pa) * (1.0 - pb))), 6)
              |       END AS kappa
              |FROM k""".stripMargin)),

    // ── Split-leakage audit (Curation.splitLeakage): LSH banding
    //    candidate pairs bucketed by the train/val/test pair they
    //    straddle — the eval-integrity check (near-dups shared by train
    //    and val inflate validation metrics). Splits are pure hash
    //    functions of the ids, so the classification is map-side over
    //    the pair relation; the report is ≤6 rows.
    ("split_leakage_check",
      (spark, dir) =>
        Curation.splitLeakage(
          Dedup.lshCandidatePairs(Tables.documents(spark, dir), 8, 2)),
      Some {
        val sigs = (0 until 8).map(i => s"${sqlMinhash(i)} AS s$i").mkString(", ")
        val bands = (0 until 4).map(i => s"md5(s${2 * i} || '|' || s${2 * i + 1}) AS b$i").mkString(", ")
        val joins = (0 until 4).map(i =>
          s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             |FROM bands a JOIN bands b ON a.b$i = b.b$i AND a.doc_id < b.doc_id""".stripMargin)
          .mkString("\nUNION\n")
        def splitOf(c: String) =
          s"CASE WHEN ${sqlHashBucket(c, 100)} < 80 THEN 'train' WHEN ${sqlHashBucket(c, 100)} < 90 THEN 'val' ELSE 'test' END"
        s"""WITH sigs AS (SELECT doc_id, $sigs FROM documents),
           |bands AS (SELECT doc_id, $bands FROM sigs),
           |cp AS (SELECT DISTINCT doc_a, doc_b FROM ($joins)),
           |sp AS (SELECT ${splitOf("doc_a")} AS s_a, ${splitOf("doc_b")} AS s_b FROM cp),
           |cells AS (
           |  SELECT least(s_a, s_b) AS split_lo, greatest(s_a, s_b) AS split_hi,
           |         CAST(COUNT(*) AS BIGINT) AS n_pairs
           |  FROM sp GROUP BY 1, 2),
           |t AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS tot FROM cells)
           |SELECT split_lo, split_hi, split_lo <> split_hi AS cross_split, n_pairs,
           |       round(CAST(n_pairs AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS pair_share
           |FROM cells CROSS JOIN t ORDER BY split_lo, split_hi""".stripMargin
      }),

    // ── Mixture drift (Curation.mixtureDrift): KL(split‖train), JS
    //    divergence, and total variation over per-source shares for each
    //    held-out split — the distribution-shift canary. Laplace-smoothed
    //    exact ratios; per-source terms rounded to integer micro-nats
    //    BEFORE the sum (a double Σ would be partition-order-dependent).
    ("mixture_kl_drift",
      (spark, dir) =>
        Curation.mixtureDrift(Tables.documents(spark, dir), "source",
                              col("doc_id")),
      Some(s"""WITH cells AS (
              |  SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
              |         source AS grp, COUNT(*) AS c
              |  FROM (SELECT source, $sqlHashBucket100 AS b FROM documents)
              |  GROUP BY 1, 2),
              |grps AS (SELECT DISTINCT grp FROM cells),
              |vocab AS (SELECT COUNT(*) AS v FROM grps),
              |totals AS (SELECT split, CAST(SUM(c) AS BIGINT) AS n_docs FROM cells GROUP BY 1),
              |grid AS (
              |  SELECT t.split, g.grp, t.n_docs,
              |         CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / CAST(t.n_docs + v.v AS DOUBLE) AS p
              |  FROM grps g CROSS JOIN totals t CROSS JOIN vocab v
              |  LEFT JOIN cells c ON c.split = t.split AND c.grp = g.grp),
              |tr AS (SELECT grp, p AS q FROM grid WHERE split = 'train'),
              |h AS (SELECT grid.split, grid.n_docs, grid.p, tr.q
              |      FROM grid JOIN tr USING (grp) WHERE grid.split <> 'train'),
              |ag AS (
              |  SELECT split, n_docs,
              |         CAST(SUM(CAST(round(p * ln(p / q) * 1000000.0) AS BIGINT)) AS BIGINT) AS kl_vs_train_micronats,
              |         CAST(SUM(CAST(round((p * ln(p / ((p + q) / 2.0)) + q * ln(q / ((p + q) / 2.0))) * 0.5 * 1000000.0) AS BIGINT)) AS BIGINT) AS js_micronats,
              |         CAST(SUM(CAST(round(abs(p - q) * 0.5 * 1000000.0) AS BIGINT)) AS BIGINT) AS tvd_micro
              |  FROM h GROUP BY 1, 2)
              |SELECT split, n_docs, kl_vs_train_micronats, js_micronats, tvd_micro,
              |       round(kl_vs_train_micronats / 1000000.0, 6) AS kl_nats,
              |       round(js_micronats / 1000000.0, 6) AS js_nats,
              |       round(tvd_micro / 1000000.0, 6) AS tvd
              |FROM ag ORDER BY split""".stripMargin)),

    // ── Hard-negative mining (Similarity.hardNegatives): per query, the
    //    k highest-cosine corpus vectors with a DIFFERENT label — the
    //    contrastive-training negatives that are closest in embedding
    //    space while semantically wrong. Same broadcast-queries /
    //    streaming-corpus / partial-agg top-k family as cosine_topk; the
    //    label-mismatch predicate runs before the dot product.
    ("hard_negatives",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.hardNegatives(emb.filter(col("vec_id") < 8),
                                 emb.filter(col("vec_id") >= 8), 5)
          .transform(CatalogCore.orderedReport(_,
            col("q_id"), col("cos_sim").desc, col("vec_id")))
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
             |           FROM embeddings WHERE vec_id < 8),
             |scored AS (
             |  SELECT q.q_id, e.vec_id,
             |         round(list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
             |  FROM q CROSS JOIN embeddings e
             |  WHERE e.vec_id >= 8 AND e.label <> q.q_label)
             |SELECT q_id, vec_id, cos_sim FROM scored
             |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) <= 5
             |ORDER BY q_id, cos_sim DESC, vec_id""".stripMargin)),

    // ── NB-classifier reliability bins (TextAnalysis.reliabilityBins):
    //    ECE-style calibration audit — per score-quartile bin, the actual
    //    reference-class rate vs the mean sigmoid confidence and their
    //    gap. Exact-percentile literal cuts (the curriculum_phases
    //    parity); per-doc probabilities rounded to integer micro-units
    //    BEFORE the sum (exact BIGINT bin confidence).
    ("nb_reliability_bins",
      (spark, dir) =>
        TextAnalysis.reliabilityBins(
          TextAnalysis.nbClassifierScores(Tables.documents(spark, dir),
            refLang = "en", vocabSize = 50),
          refLang = "en", bins = 4),
      Some(s"""WITH $sqlNbScoredCtes,
              |cuts AS (
              |  SELECT round(quantile_cont(mean_logodds_unats, 0.25), 6) AS c0,
              |         round(quantile_cont(mean_logodds_unats, 0.5), 6) AS c1,
              |         round(quantile_cont(mean_logodds_unats, 0.75), 6) AS c2
              |  FROM nbdoc),
              |bd AS (
              |  SELECT CAST(1 + (CASE WHEN mean_logodds_unats > c0 THEN 1 ELSE 0 END)
              |              + (CASE WHEN mean_logodds_unats > c1 THEN 1 ELSE 0 END)
              |              + (CASE WHEN mean_logodds_unats > c2 THEN 1 ELSE 0 END) AS INTEGER) AS bin,
              |         lang,
              |         CAST(round(1000000.0 / (1.0 + exp(-mean_logodds_unats / 1000000.0))) AS BIGINT) AS p
              |  FROM nbdoc CROSS JOIN cuts),
              |ag AS (
              |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
              |         CAST(SUM(p) AS BIGINT) AS conf_micro_sum
              |  FROM bd GROUP BY 1)
              |SELECT bin, n_docs, n_ref, conf_micro_sum,
              |       round(CAST(n_ref AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS ref_rate,
              |       round(CAST(conf_micro_sum AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1000000.0, 6) AS mean_conf,
              |       round(abs(CAST(n_ref AS DOUBLE) / CAST(n_docs AS DOUBLE)
              |                 - CAST(conf_micro_sum AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1000000.0), 6) AS calib_gap
              |FROM ag ORDER BY bin""".stripMargin)),

    // ── Murphy Brier decomposition (TextAnalysis.brierDecomposition):
    //    reliability − resolution + uncertainty over the same NB score
    //    bins, next to the exact unbinned Brier score — bin sums as
    //    ascending-bin list_reduce folds (the kaplan_meier mirror).
    ("brier_decomposition",
      (spark, dir) =>
        TextAnalysis.brierDecomposition(
          TextAnalysis.nbClassifierScores(Tables.documents(spark, dir),
            refLang = "en", vocabSize = 50),
          refLang = "en", bins = 4),
      Some {
        val pBar = "CAST(x.s AS DOUBLE) / (CAST(x.n AS DOUBLE) * 1000000.0)"
        val oBarK = "CAST(x.o AS DOUBLE) / CAST(x.n AS DOUBLE)"
        val oBar = "CAST(ot AS DOUBLE) / CAST(nt AS DOUBLE)"
        val rel = s"""list_reduce([CAST(0.0 AS DOUBLE)] ||
                     |  list_transform(a, x -> CAST(x.n AS DOUBLE)
                     |    * (($pBar - $oBarK) * ($pBar - $oBarK))),
                     |  (u, v) -> u + v) / CAST(nt AS DOUBLE)""".stripMargin
        val res = s"""list_reduce([CAST(0.0 AS DOUBLE)] ||
                     |  list_transform(a, x -> CAST(x.n AS DOUBLE)
                     |    * (($oBarK - $oBar) * ($oBarK - $oBar))),
                     |  (u, v) -> u + v) / CAST(nt AS DOUBLE)""".stripMargin
        val unc = s"($oBar) * (1.0 - $oBar)"
        s"""WITH $sqlNbScoredCtes,
           |cuts AS (
           |  SELECT round(quantile_cont(mean_logodds_unats, 0.25), 6) AS c0,
           |         round(quantile_cont(mean_logodds_unats, 0.5), 6) AS c1,
           |         round(quantile_cont(mean_logodds_unats, 0.75), 6) AS c2
           |  FROM nbdoc),
           |bd AS (
           |  SELECT CAST(1 + (CASE WHEN mean_logodds_unats > c0 THEN 1 ELSE 0 END)
           |              + (CASE WHEN mean_logodds_unats > c1 THEN 1 ELSE 0 END)
           |              + (CASE WHEN mean_logodds_unats > c2 THEN 1 ELSE 0 END) AS INTEGER) AS bin,
           |         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS o,
           |         CAST(round(1000000.0 / (1.0 + exp(-mean_logodds_unats / 1000000.0))) AS BIGINT) AS p
           |  FROM nbdoc CROSS JOIN cuts),
           |pb AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           |              CAST(SUM(o) AS BIGINT) AS o, CAST(SUM(p) AS BIGINT) AS s,
           |              SUM(CAST(p - o * 1000000 AS HUGEINT) * (p - o * 1000000)) AS sq
           |       FROM bd GROUP BY 1),
           |g AS (SELECT list(struct_pack(bin := bin, n := n, o := o, s := s)
           |               ORDER BY bin) AS a,
           |             CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(o) AS BIGINT) AS ot,
           |             SUM(sq) AS sqt
           |      FROM pb)
           |SELECT nt AS n_docs, ot AS n_ref,
           |  round(CAST(sqt AS DOUBLE) / 1000000000000.0 / CAST(nt AS DOUBLE), 6) AS brier_score,
           |  round($rel, 6) AS reliability,
           |  round($res, 6) AS resolution,
           |  round($unc, 6) AS uncertainty,
           |  round(($rel) - ($res) + ($unc), 6) AS binned_brier
           |FROM g WHERE nt IS NOT NULL""".stripMargin
      }),

    // ── Market-basket association rules (Stats.copurchaseLift):
    //    brand-pair support / directional confidence / lift over the
    //    per-order distinct-brand sets. Pair universe bounded by brands²;
    //    all ratios from exact BIGINTs, mirrored expression-for-expression.
    ("copurchase_lift",
      (spark, dir) =>
        Stats.copurchaseLift(Tables.lineitem(spark, dir), Tables.part(spark, dir))
          .transform(CatalogCore.orderedReport(_, col("brand_a"), col("brand_b"))),
      Some("""WITH ob AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
             |            FROM lineitem JOIN part ON p_partkey = l_partkey),
             |t AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM ob),
             |bc AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_brand FROM ob GROUP BY 1),
             |pr AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
             |              CAST(COUNT(*) AS BIGINT) AS n_pair
             |       FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
             |       GROUP BY 1, 2)
             |SELECT brand_a, brand_b, n_pair, ca.n_brand AS n_a, cb.n_brand AS n_b,
             |       round(CAST(n_pair AS DOUBLE) / n_orders, 6) AS support,
             |       round(CAST(n_pair AS DOUBLE) / ca.n_brand, 6) AS conf_a_to_b,
             |       round(CAST(n_pair AS DOUBLE) / cb.n_brand, 6) AS conf_b_to_a,
             |       round(CAST(n_pair AS DOUBLE) * n_orders
             |             / (CAST(ca.n_brand AS DOUBLE) * cb.n_brand), 6) AS lift
             |FROM pr
             |JOIN bc ca ON brand_a = ca.brand
             |JOIN bc cb ON brand_b = cb.brand
             |CROSS JOIN t
             |ORDER BY brand_a, brand_b""".stripMargin)),

    // ── Per-nation revenue Gini (Stats.giniConcentration): inequality of
    //    customer spend within each nation, computed from the per-nation
    //    value histogram with decimal-exact rank sums (HUGEINT on the twin).
    ("revenue_gini",
      (spark, dir) => {
        val cents = Scalars.moneyCents(col("o_totalprice"))
        val perCust = Tables.orders(spark, dir).groupBy(col("o_custkey"))
          .agg(sum(cents).as("cents"))
        val members = perCust
          .join(Tables.customer(spark, dir)
                  .select(col("c_custkey"), col("c_nationkey")),
                col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(spark, dir)
                  .select(col("n_nationkey"), col("n_name"))),
                col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("cents"))
        Stats.giniConcentration(members, "n_name", col("cents"))
          .transform(CatalogCore.orderedReport(_, col("n_name")))
      },
      Some("""WITH pc AS (
             |  SELECT o_custkey,
             |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |m AS (SELECT n_name, cents FROM pc
             |      JOIN customer ON o_custkey = c_custkey
             |      JOIN nation ON c_nationkey = n_nationkey),
             |h AS (SELECT n_name, cents AS v, CAST(COUNT(*) AS BIGINT) AS c
             |      FROM m GROUP BY 1, 2),
             |x AS (SELECT n_name, v, c,
             |             COALESCE(SUM(c) OVER (PARTITION BY n_name ORDER BY v
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
             |      FROM h),
             |a AS (SELECT n_name, CAST(SUM(c) AS BIGINT) AS n,
             |             SUM(CAST(v AS HUGEINT) * c) AS t,
             |             SUM(CAST(v AS HUGEINT)
             |                 * (CAST(c AS HUGEINT) * prev + (c * (c + 1)) // 2)) AS srx
             |      FROM x GROUP BY 1)
             |SELECT n_name, n, CAST(t AS BIGINT) AS total,
             |       CASE WHEN CAST(t AS DOUBLE) = 0.0 THEN NULL
             |            ELSE round((2.0 * CAST(srx AS DOUBLE)
             |                        - CAST(n + 1 AS DOUBLE) * CAST(t AS DOUBLE))
             |                       / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)), 6)
             |       END AS gini
             |FROM a ORDER BY n_name""".stripMargin)),

    // ── Vocabulary concentration (Stats.giniConcentration over token
    //    frequencies): Gini of the token-frequency distribution — the
    //    "is this corpus a few templates or a diverse vocabulary" scalar
    //    next to zipf_rank_slope's fit and source_mix_entropy's mixture
    //    view. Pure reuse of the hash-pinned histogram-Gini machinery
    //    (decimal-exact rank sums, HUGEINT twin) at (scope, token-count)
    //    grain.
    ("vocab_concentration",
      (spark, dir) =>
        Stats.giniConcentration(
          TextAnalysis.explodeTokens(Tables.documents(spark, dir))
            .groupBy(col("token")).agg(count(lit(1)).as("c"))
            .select(lit("corpus").as("scope"), col("c")),
          "scope", col("c")),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
             |tc AS (SELECT 'corpus' AS scope, CAST(COUNT(*) AS BIGINT) AS cnt
             |       FROM tok GROUP BY token),
             |h AS (SELECT scope, cnt AS v, CAST(COUNT(*) AS BIGINT) AS c
             |      FROM tc GROUP BY 1, 2),
             |x AS (SELECT scope, v, c,
             |             COALESCE(SUM(c) OVER (PARTITION BY scope ORDER BY v
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
             |      FROM h),
             |a AS (SELECT scope, CAST(SUM(c) AS BIGINT) AS n,
             |             SUM(CAST(v AS HUGEINT) * c) AS t,
             |             SUM(CAST(v AS HUGEINT)
             |                 * (CAST(c AS HUGEINT) * prev + (c * (c + 1)) // 2)) AS srx
             |      FROM x GROUP BY 1)
             |SELECT scope, n, CAST(t AS BIGINT) AS total,
             |       CASE WHEN CAST(t AS DOUBLE) = 0.0 THEN NULL
             |            ELSE round((2.0 * CAST(srx AS DOUBLE)
             |                        - CAST(n + 1 AS DOUBLE) * CAST(t AS DOUBLE))
             |                       / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)), 6)
             |       END AS gini
             |FROM a""".stripMargin)),

    // ── RFM customer segmentation (Stats.rfmSegments): quintile scores
    //    from exact-percentile literal cuts (quantile_cont parity, rounded
    //    6 before use), reported per segment.
    ("customer_rfm",
      (spark, dir) =>
        Stats.rfmSegments(Tables.orders(spark, dir))
          .transform(CatalogCore.orderedReport(_, col("segment"))),
      Some("""WITH pc AS (
             |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_day,
             |         CAST(COUNT(*) AS BIGINT) AS f,
             |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m
             |  FROM orders GROUP BY 1),
             |anch AS (SELECT max(last_day) AS anchor FROM pc),
             |prf AS (SELECT o_custkey, date_diff('day', last_day, anchor) AS r, f, m
             |        FROM pc CROSS JOIN anch),
             |cuts AS (SELECT
             |  round(quantile_cont(r, 0.2), 6) AS r0, round(quantile_cont(r, 0.4), 6) AS r1,
             |  round(quantile_cont(r, 0.6), 6) AS r2, round(quantile_cont(r, 0.8), 6) AS r3,
             |  round(quantile_cont(f, 0.2), 6) AS f0, round(quantile_cont(f, 0.4), 6) AS f1,
             |  round(quantile_cont(f, 0.6), 6) AS f2, round(quantile_cont(f, 0.8), 6) AS f3,
             |  round(quantile_cont(m, 0.2), 6) AS m0, round(quantile_cont(m, 0.4), 6) AS m1,
             |  round(quantile_cont(m, 0.6), 6) AS m2, round(quantile_cont(m, 0.8), 6) AS m3
             |  FROM prf),
             |sc AS (SELECT
             |  6 - (1 + CASE WHEN r > r0 THEN 1 ELSE 0 END + CASE WHEN r > r1 THEN 1 ELSE 0 END
             |         + CASE WHEN r > r2 THEN 1 ELSE 0 END + CASE WHEN r > r3 THEN 1 ELSE 0 END) AS rs,
             |  1 + CASE WHEN f > f0 THEN 1 ELSE 0 END + CASE WHEN f > f1 THEN 1 ELSE 0 END
             |    + CASE WHEN f > f2 THEN 1 ELSE 0 END + CASE WHEN f > f3 THEN 1 ELSE 0 END AS fs,
             |  1 + CASE WHEN m > m0 THEN 1 ELSE 0 END + CASE WHEN m > m1 THEN 1 ELSE 0 END
             |    + CASE WHEN m > m2 THEN 1 ELSE 0 END + CASE WHEN m > m3 THEN 1 ELSE 0 END AS ms,
             |  r, m FROM prf CROSS JOIN cuts)
             |SELECT CAST(rs AS VARCHAR) || '-' || CAST(fs AS VARCHAR) || '-' || CAST(ms AS VARCHAR) AS segment,
             |       CAST(COUNT(*) AS BIGINT) AS n_customers,
             |       CAST(SUM(m) AS BIGINT) AS monetary_cents,
             |       round(avg(r), 6) AS mean_recency_days
             |FROM sc GROUP BY 1 ORDER BY segment""".stripMargin)),

    // ── EWMA daily-revenue anomaly screen (Stats.ewmaDailyAnomalies):
    //    weights ×2⁶ so numer64/denom64 are EXACT BIGINTs on both engines;
    //    anomaly flag + ewma_cents are pure integer arithmetic (half-up
    //    div), and the only floating point is dev_ratio's mirrored
    //    CAST-double division at magnitude ≲10 — no decimal-literal typing
    //    or precision-edge round left to the oracle engine's version
    //    (the round-9 red row was exactly that drift).
    ("daily_revenue_ewma",
      (spark, dir) => Stats.ewmaDailyAnomalies(Tables.orders(spark, dir)),
      Some("""WITH d AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
             |  FROM orders GROUP BY 1),
             |l AS (SELECT day, rev_cents,
             |             lag(rev_cents, 1) OVER (ORDER BY day) AS l1,
             |             lag(rev_cents, 2) OVER (ORDER BY day) AS l2,
             |             lag(rev_cents, 3) OVER (ORDER BY day) AS l3,
             |             lag(rev_cents, 4) OVER (ORDER BY day) AS l4,
             |             lag(rev_cents, 5) OVER (ORDER BY day) AS l5,
             |             lag(rev_cents, 6) OVER (ORDER BY day) AS l6,
             |             lag(rev_cents, 7) OVER (ORDER BY day) AS l7
             |      FROM d),
             |e AS (SELECT day, rev_cents,
             |  (CASE WHEN l1 IS NOT NULL THEN l1 * CAST(64 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l2 IS NOT NULL THEN l2 * CAST(32 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l3 IS NOT NULL THEN l3 * CAST(16 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l4 IS NOT NULL THEN l4 * CAST(8 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l5 IS NOT NULL THEN l5 * CAST(4 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l6 IS NOT NULL THEN l6 * CAST(2 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l7 IS NOT NULL THEN l7 * CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS numer64,
             |  (CASE WHEN l1 IS NOT NULL THEN CAST(64 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l2 IS NOT NULL THEN CAST(32 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l3 IS NOT NULL THEN CAST(16 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l4 IS NOT NULL THEN CAST(8 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l5 IS NOT NULL THEN CAST(4 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l6 IS NOT NULL THEN CAST(2 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l7 IS NOT NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS denom64
             |  FROM l)
             |SELECT day, rev_cents,
             |       CASE WHEN denom64 > 0 THEN
             |         (numer64 * 2 + denom64) // (denom64 * 2) END AS ewma_cents,
             |       CASE WHEN denom64 > 0 THEN
             |         round(CAST(rev_cents * denom64 - numer64 AS DOUBLE) / CAST(numer64 AS DOUBLE), 6) END AS dev_ratio,
             |       CASE WHEN denom64 = 0 THEN NULL
             |            ELSE abs(rev_cents * denom64 - numer64) * CAST(4 AS BIGINT) > numer64 END AS is_anomaly
             |FROM e ORDER BY day""".stripMargin)),

    // ── BM25 ranked retrieval (TextAnalysis.bm25TopK): literal query
    //    terms, driver-literal integer-micro idf, per-(doc,term)
    //    contributions micro-rounded BEFORE the per-doc sum (exact BIGINT
    //    aggregate), TakeOrdered top-20 with doc_id tie-break.
    ("bm25_topk",
      (spark, dir) =>
        TextAnalysis.bm25TopK(Tables.documents(spark, dir),
                              Seq("join", "stream", "window"), k = 20),
      Some("""WITH d2 AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
             |                   string_split(text, ' ') AS toks
             |            FROM documents),
             |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM d2),
             |q AS (SELECT doc_id, dl, unnest(toks) AS token FROM d2),
             |qq AS (SELECT doc_id, dl, token FROM q
             |       WHERE token IN ('join', 'stream', 'window')),
             |dfs AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
             |        FROM qq GROUP BY 1),
             |idf AS (SELECT token,
             |               CAST(round(ln((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6) AS BIGINT) AS idf_micro
             |        FROM dfs CROSS JOIN st),
             |tf AS (SELECT doc_id, dl, token, CAST(COUNT(*) AS BIGINT) AS tf
             |       FROM qq GROUP BY 1, 2, 3),
             |sc AS (SELECT doc_id,
             |              CAST(round(idf_micro * (CAST(tf AS DOUBLE) * (1.2 + 1.0)
             |                / (CAST(tf AS DOUBLE)
             |                   + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (CAST(t AS DOUBLE) / n))))) AS BIGINT) AS s
             |       FROM tf JOIN idf USING (token) CROSS JOIN st),
             |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
             |               CAST(SUM(s) AS BIGINT) AS score_micro
             |        FROM sc GROUP BY 1)
             |SELECT doc_id, n_terms_matched, score_micro,
             |       CAST(score_micro AS DOUBLE) / 1e6 AS bm25
             |FROM agg ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin)),

    // ── Flesch readability (TextAnalysis.readability): reading-ease and
    //    FK grade from exact integer word/sentence/vowel-run counts — pure
    //    map-side scan arithmetic, one row per doc.
    ("readability_scores",
      (spark, dir) =>
        TextAnalysis.readability(Tables.documents(spark, dir))
          .orderBy(col("doc_id")),
      Some("""WITH f AS (SELECT doc_id,
             |                  len(string_split(text, ' ')) AS w,
             |                  greatest(1, len(list_filter(string_split_regex(text, '[.!?]'),
             |                                              s -> length(trim(s)) > 0))) AS s,
             |                  len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
             |           FROM documents)
             |SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
             |       round(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
             |             - 84.6 * (y / CAST(w AS DOUBLE)), 6) AS flesch_ease,
             |       round(0.39 * (CAST(w AS DOUBLE) / s)
             |             + 11.8 * (y / CAST(w AS DOUBLE)) - 15.59, 6) AS fk_grade
             |FROM f WHERE w > 0 ORDER BY doc_id""".stripMargin)),

    // ── Set-containment duplicate pairs (Dedup.containmentPairs): the
    //    asymmetric |A∩B|/|A| measure over the same df-capped hashed
    //    shingle universe as ngram_jaccard_dups — catches subset/superset
    //    duplication that Jaccard structurally misses.
    ("containment_dups",
      (spark, dir) =>
        Dedup.containmentPairs(Tables.documents(spark, dir), 3, 0.8,
                               maxShingleDf = 50)
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH sh0 AS (
              |  SELECT DISTINCT doc_id, unnest(${sqlShingles(3)}) AS g FROM documents),
              |keep AS (SELECT g FROM (SELECT g, COUNT(*) AS df FROM sh0 GROUP BY g) WHERE df <= 50),
              |sh AS (SELECT sh0.doc_id, sh0.g FROM sh0 JOIN keep USING (g)),
              |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
              |pairs AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
              |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS n_shared,
              |       round(CAST(shared AS DOUBLE) / sa.sz, 6) AS containment_a,
              |       round(CAST(shared AS DOUBLE) / sb.sz, 6) AS containment_b
              |FROM pairs
              |JOIN sizes sa ON doc_a = sa.doc_id
              |JOIN sizes sb ON doc_b = sb.doc_id
              |WHERE greatest(CAST(shared AS DOUBLE) / sa.sz,
              |               CAST(shared AS DOUBLE) / sb.sz) >= 0.8
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // ── Snapshot drift report (Profile.snapshotDrift): two column
    //    profiles joined with the ingest-gate deltas — null-rate movement,
    //    distinct ratio, row ratio, null-safe min/max boundary flags. The
    //    "snapshots" are the order stream split at a pivot date.
    ("orders_snapshot_drift",
      (spark, dir) => {
        val o = Tables.orders(spark, dir)
          .withColumn("__d", to_date(col("o_orderdate")))
        val pivot = lit(java.sql.Date.valueOf("1995-06-17"))
        val specs = Seq(
          ("o_custkey", col("o_custkey"), col("o_custkey")),
          ("o_orderpriority", col("o_orderpriority"), col("o_orderpriority")),
          ("o_orderstatus", col("o_orderstatus"), col("o_orderstatus")),
          ("o_totalprice", col("o_totalprice"),
            Scalars.moneyCents(col("o_totalprice"))))
        Profile.snapshotDrift(o.filter(col("__d") < pivot),
                              o.filter(col("__d") >= pivot), specs)
      },
      Some {
        def side(s: String, cmp: String) = {
          def block(nm: String, canon: String) =
            s"""SELECT '$nm' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows_$s,
               |       CAST(COUNT(*) - COUNT($nm) AS BIGINT) AS n_nulls_$s,
               |       CAST(COUNT(DISTINCT $canon) AS BIGINT) AS n_distinct_$s,
               |       CAST(MIN($canon) AS VARCHAR) AS mn_$s,
               |       CAST(MAX($canon) AS VARCHAR) AS mx_$s
               |FROM orders WHERE CAST(o_orderdate AS DATE) $cmp DATE '1995-06-17'""".stripMargin
          Seq(block("o_custkey", "o_custkey"),
              block("o_orderpriority", "o_orderpriority"),
              block("o_orderstatus", "o_orderstatus"),
              block("o_totalprice", "CAST(round(o_totalprice * 100) AS BIGINT)"))
            .mkString("", "\nUNION ALL\n", "")
        }
        s"""WITH pa AS (
           |${side("a", "<")}),
           |pb AS (
           |${side("b", ">=")})
           |SELECT column_name, n_rows_a, n_rows_b, n_nulls_a, n_nulls_b,
           |       n_distinct_a, n_distinct_b,
           |       round((CASE WHEN n_rows_b > 0 THEN CAST(n_nulls_b AS DOUBLE) / n_rows_b END)
           |             - (CASE WHEN n_rows_a > 0 THEN CAST(n_nulls_a AS DOUBLE) / n_rows_a END), 6) AS null_rate_delta,
           |       CASE WHEN n_distinct_a > 0
           |            THEN round(CAST(n_distinct_b AS DOUBLE) / n_distinct_a, 6) END AS distinct_ratio,
           |       CASE WHEN n_rows_a > 0
           |            THEN round(CAST(n_rows_b AS DOUBLE) / n_rows_a, 6) END AS row_ratio,
           |       (mn_a IS DISTINCT FROM mn_b) AS min_changed,
           |       (mx_a IS DISTINCT FROM mx_b) AS max_changed
           |FROM pa JOIN pb USING (column_name) ORDER BY column_name""".stripMargin
      }),

    // ── Language-ID confusion matrix (TextAnalysis.langIdConfusion): the
    //    heuristic's per-class QA against the labeled lang column.
    ("langid_confusion",
      (spark, dir) =>
        TextAnalysis.langIdConfusion(Tables.documents(spark, dir))
          .transform(CatalogCore.orderedReport(_, col("lang"), col("predicted"))),
      Some(s"""WITH p AS (
              |  SELECT lang,
              |         CASE WHEN CAST(len(list_filter($sqlTokens, t -> list_contains($stopListSql, t))) AS DOUBLE)
              |                   / len($sqlTokens) >= 0.04
              |              THEN 'en' ELSE 'und' END AS predicted
              |  FROM documents),
              |c AS (SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
              |      FROM p GROUP BY 1, 2),
              |t AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS tt FROM c GROUP BY 1)
              |SELECT lang, predicted, n_docs,
              |       round(CAST(n_docs AS DOUBLE) / tt, 6) AS share_of_lang
              |FROM c JOIN t USING (lang) ORDER BY lang, predicted""".stripMargin)),

    // ── Deterministic weighted sampling without replacement
    //    (Curation.weightedSampleNoReplace, Efraimidis–Spirakis A-ES):
    //    −ln(u)/w keys from hash-uniform u, integer nano-units, exact
    //    top-k — the corpus-subsampling primitive with rerun stability.
    ("weighted_doc_sample",
      (spark, dir) =>
        Curation.weightedSampleNoReplace(Tables.documents(spark, dir), 100,
                                         col("n_chars")),
      Some("""WITH k AS (
             |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             |         CAST(round(-ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) + 1)
             |                        / 4294967296.0) / n_chars * 1e9) AS BIGINT) AS key_nano
             |  FROM documents)
             |SELECT doc_id, weight, key_nano FROM k
             |ORDER BY key_nano, doc_id LIMIT 100""".stripMargin)),

    // ── Day-of-week seasonal outliers (Stats.dowSeasonalOutliers): each
    //    day vs the mean of its 4 prior same-weekday values; weekday index
    //    mirrors Spark's non-negative pmod explicitly (((x%7)+7)%7, not
    //    bare % — round-9 ADVICE); mean + flag are integer-exact (half-up
    //    div / cross-multiplication), only dev_ratio divides in double.
    ("dow_seasonal_outliers",
      (spark, dir) => Stats.dowSeasonalOutliers(Tables.orders(spark, dir)),
      Some("""WITH d AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
             |  FROM orders GROUP BY 1),
             |dd AS (SELECT day, rev_cents,
             |              CAST((((date_diff('day', DATE '1970-01-01', day) + 4) % 7) + 7) % 7 AS INTEGER) AS dow_idx
             |       FROM d),
             |l AS (SELECT day, dow_idx, rev_cents,
             |             lag(rev_cents, 1) OVER w AS l1,
             |             lag(rev_cents, 2) OVER w AS l2,
             |             lag(rev_cents, 3) OVER w AS l3,
             |             lag(rev_cents, 4) OVER w AS l4
             |      FROM dd WINDOW w AS (PARTITION BY dow_idx ORDER BY day)),
             |e AS (SELECT day, dow_idx, rev_cents,
             |  (CASE WHEN l1 IS NOT NULL THEN l1 ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l2 IS NOT NULL THEN l2 ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l3 IS NOT NULL THEN l3 ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l4 IS NOT NULL THEN l4 ELSE CAST(0 AS BIGINT) END) AS numer,
             |  (CASE WHEN l1 IS NOT NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l2 IS NOT NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l3 IS NOT NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             |   + CASE WHEN l4 IS NOT NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS denom
             |  FROM l)
             |SELECT day, dow_idx, rev_cents,
             |       CASE WHEN denom > 0 THEN
             |         (numer * 2 + denom) // (denom * 2) END AS dow_mean_cents,
             |       CASE WHEN denom > 0 THEN
             |         round(CAST(rev_cents * denom - numer AS DOUBLE) / CAST(numer AS DOUBLE), 6) END AS dev_ratio,
             |       CASE WHEN denom = 0 THEN NULL
             |            ELSE abs(rev_cents * denom - numer) * CAST(10 AS BIGINT) > numer * CAST(3 AS BIGINT) END AS is_anomaly
             |FROM e ORDER BY day""".stripMargin)),

    // ── Per-language quality rank normalization
    //    (Curation.rankNormalizedQuality): percent_rank of the heuristic
    //    quality score within each language — calibration-free
    //    cross-language comparability before a global sampling weight.
    ("lang_quality_pctile",
      (spark, dir) =>
        Curation.rankNormalizedQuality(Tables.documents(spark, dir))
          .orderBy(col("doc_id")),
      Some(s"""WITH f AS (
              |  SELECT doc_id, lang,
              |         len($sqlTokens) AS n_tokens,
              |         len(list_distinct($sqlTokens)) AS n_distinct,
              |         len(list_filter($sqlTokens, t -> list_contains($stopListSql, t))) AS stop_hits
              |  FROM documents),
              |q AS (
              |  SELECT doc_id, lang,
              |         least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
              |           + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3
              |           + least((CAST(stop_hits AS DOUBLE) / n_tokens) * 5.0, 1.0) * 0.3 AS quality_score
              |  FROM f)
              |SELECT doc_id, lang, round(quality_score, 6) AS quality_score,
              |       round(percent_rank() OVER (PARTITION BY lang ORDER BY quality_score, doc_id), 6) AS lang_pctile
              |FROM q ORDER BY doc_id""".stripMargin)),

    // ── Winsorized/trimmed robust price stats (Stats.winsorizedStats):
    //    global 1%/99% exact-percentile clip bounds rounded to integer
    //    cents, per-priority clip counts and robust means — BIGINT end to
    //    end until the final division.
    ("winsorized_price_stats",
      (spark, dir) =>
        Stats.winsorizedStats(Tables.orders(spark, dir), "o_orderpriority",
                              Scalars.moneyCents(col("o_totalprice")))
          .transform(CatalogCore.orderedReport(_, col("o_orderpriority"))),
      Some("""WITH v AS (SELECT o_orderpriority AS grp,
             |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
             |           FROM orders),
             |c AS (SELECT CAST(round(round(quantile_cont(v, 0.01), 6)) AS BIGINT) AS lo,
             |             CAST(round(round(quantile_cont(v, 0.99), 6)) AS BIGINT) AS hi
             |      FROM v),
             |a AS (SELECT grp, lo, hi, CAST(COUNT(*) AS BIGINT) AS n,
             |             CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
             |             CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
             |             CAST(SUM(least(greatest(v, lo), hi)) AS BIGINT) AS ws,
             |             CAST(SUM(CASE WHEN v >= lo AND v <= hi THEN v ELSE 0 END) AS BIGINT) AS ts,
             |             CAST(SUM(CASE WHEN v >= lo AND v <= hi THEN 1 ELSE 0 END) AS BIGINT) AS tn
             |      FROM v CROSS JOIN c GROUP BY 1, 2, 3)
             |SELECT grp AS o_orderpriority, n, n_clip_lo, n_clip_hi,
             |       lo AS lo_clip, hi AS hi_clip,
             |       round(CAST(ws AS DOUBLE) / n, 6) AS winsorized_mean,
             |       CASE WHEN tn > 0 THEN round(CAST(ts AS DOUBLE) / tn, 6) END AS trimmed_mean
             |FROM a ORDER BY o_orderpriority""".stripMargin)),

    // ── Two-proportion A/B z-test + SRM guardrail
    //    (Stats.abConversionTest): hash-bucketed arms, conversion =
    //    purchases outnumber errors per user, pooled-variance z (NULL on
    //    degenerate variance) and the 50/50 sample-ratio chi-square.
    ("ab_conversion_ztest",
      (spark, dir) => Stats.abConversionTest(Tables.events(spark, dir)),
      Some(s"""WITH u AS (
              |  SELECT user_id,
              |         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              |                   > SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              |              THEN 1 ELSE 0 END AS conv
              |  FROM events GROUP BY 1),
              |b AS (SELECT conv, ${sqlHashBucket("user_id", 2)} = 0 AS isa FROM u),
              |c AS (SELECT CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
              |             CAST(SUM(CASE WHEN isa THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
              |             CAST(SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
              |             CAST(SUM(CASE WHEN NOT isa THEN conv ELSE 0 END) AS BIGINT) AS conv_b
              |      FROM b),
              |s AS (SELECT n_a, conv_a, n_b, conv_b,
              |             CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
              |             CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
              |             CAST(conv_a + conv_b AS DOUBLE)
              |               / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp,
              |             (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0 AS half
              |      FROM c),
              |s2 AS (SELECT *,
              |              sqrt(pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS se,
              |              (CAST(n_a AS DOUBLE) - half) * (CAST(n_a AS DOUBLE) - half) / half
              |                + (CAST(n_b AS DOUBLE) - half) * (CAST(n_b AS DOUBLE) - half) / half AS srm
              |       FROM s)
              |SELECT n_a, conv_a, n_b, conv_b,
              |       round(pa, 6) AS p_a, round(pb, 6) AS p_b,
              |       round(CASE WHEN se > 0.0 THEN (pa - pb) / se END, 6) AS z_score,
              |       round(srm, 6) AS srm_chisq,
              |       (srm > 3.84) AS srm_flag
              |FROM s2""".stripMargin)),

    // ── Wilson 95% score intervals (Stats.wilsonRates): per-priority
    //    finished-order rate with the small-sample-honest CI.
    ("priority_wilson_ci",
      (spark, dir) =>
        Stats.wilsonRates(Tables.orders(spark, dir), "o_orderpriority",
                          col("o_orderstatus") === lit("F"))
          .transform(CatalogCore.orderedReport(_, col("o_orderpriority"))),
      Some("""WITH a AS (
             |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             |         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_success
             |  FROM orders GROUP BY 1),
             |s AS (SELECT o_orderpriority, n, n_success,
             |             CAST(n_success AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             |             (1.96 * 1.96) AS z2, CAST(n AS DOUBLE) AS nd
             |      FROM a),
             |s2 AS (SELECT *,
             |              (1.0 + z2 / nd) AS denom,
             |              (p + z2 / (2.0 * nd)) / (1.0 + z2 / nd) AS center,
             |              1.96 * sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd)) / (1.0 + z2 / nd) AS hw
             |       FROM s)
             |SELECT o_orderpriority, n, n_success, round(p, 6) AS rate,
             |       round(center - hw, 6) AS wilson_lo,
             |       round(center + hw, 6) AS wilson_hi
             |FROM s2 ORDER BY o_orderpriority""".stripMargin)),

    // ── Per-source token-length distribution (TextAnalysis
    //    .sourceTokenStats): packing/mixture sizing audit — counts, mean,
    //    exact per-group p50/p90 (percentile ≡ quantile_cont).
    ("source_token_stats",
      (spark, dir) =>
        TextAnalysis.sourceTokenStats(Tables.documents(spark, dir))
          .transform(CatalogCore.orderedReport(_, col("source"))),
      Some("""WITH t AS (SELECT source,
             |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
             |           FROM documents)
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(nt) AS BIGINT) AS total_tokens,
             |       round(avg(nt), 6) AS mean_tokens,
             |       round(quantile_cont(nt, 0.5), 6) AS p50_tokens,
             |       round(quantile_cont(nt, 0.9), 6) AS p90_tokens
             |FROM t GROUP BY 1 ORDER BY source""".stripMargin)),

    // ── Cluster-aware split manifest (Curation.clusterAwareSplitAssign):
    //    split by the DUP-CLUSTER canonical id so near-dup structure never
    //    straddles the train/eval boundary (the zero-leakage property is
    //    spec-pinned through splitLeakage); unclustered docs keep their
    //    plain id-hash split.
    ("cluster_aware_splits",
      (spark, dir) => {
        val docs = Tables.documents(spark, dir)
        Curation.clusterAwareSplitAssign(docs,
            Dedup.ngramJaccardPairs(docs, 3, 0.5))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
               sum(when(col("canonical_id").isNotNull, 1L).otherwise(0L))
                 .as("n_clustered_docs"),
               sum(col("n_chars")).as("total_chars"))
          .transform(CatalogCore.orderedReport(_, col("split")))
      },
      Some(s"""WITH RECURSIVE sh AS (
              |  SELECT DISTINCT doc_id, unnest(${sqlShingles(3)}) AS g FROM documents),
              |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
              |cnt AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
              |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |pairs0 AS (
              |  SELECT doc_a, doc_b FROM cnt
              |  JOIN sizes sa ON doc_a = sa.doc_id
              |  JOIN sizes sb ON doc_b = sb.doc_id
              |  WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
              |edges AS (
              |  SELECT doc_a AS a, doc_b AS b FROM pairs0
              |  UNION ALL SELECT doc_b, doc_a FROM pairs0),
              |reach(a, b) AS (
              |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
              |cl AS (SELECT a AS doc_id, MIN(b) AS canonical_id
              |       FROM reach GROUP BY a),
              |asg AS (
              |  SELECT d.doc_id, d.n_chars, cl.canonical_id,
              |         CASE WHEN ${sqlHashBucket("COALESCE(cl.canonical_id, d.doc_id)", 100)} < 80 THEN 'train'
              |              WHEN ${sqlHashBucket("COALESCE(cl.canonical_id, d.doc_id)", 100)} < 90 THEN 'val'
              |              ELSE 'test' END AS split
              |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
              |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |       CAST(SUM(CASE WHEN canonical_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered_docs,
              |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
              |FROM asg GROUP BY 1 ORDER BY split""".stripMargin)),

    // ── ANN recall curve (Similarity.annRecallCurve): recall@{1,5,10} of
    //    the sign-LSH ANN vs the exact top-k, both ranked once at k=10 —
    //    the operating-point eval behind choosing the single-k ann_recall
    //    number.
    ("ann_recall_curve",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.annRecallCurve(emb.filter(col("vec_id") < 8),
                                  emb.filter(col("vec_id") >= 8))
      },
      Some(s"""WITH ${sqlSignBuckets(8, 4)},
              |cand AS (
              |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS vec_id
              |  FROM buckets q JOIN buckets c ON q.t = c.t AND q.bucket = c.bucket
              |  WHERE q.vec_id < 8 AND c.vec_id >= 8),
              |annscored AS (
              |  SELECT cand.q_id, cand.vec_id, ${sqlCos("eq", "ec")} AS cos_sim
              |  FROM cand
              |  JOIN embeddings eq ON cand.q_id = eq.vec_id
              |  JOIN embeddings ec ON cand.vec_id = ec.vec_id),
              |ann AS (
              |  SELECT q_id, vec_id, rnk AS ra FROM (
              |    SELECT q_id, vec_id,
              |           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk
              |    FROM annscored) WHERE rnk <= 10),
              |exscored AS (
              |  SELECT q.vec_id AS q_id, e.vec_id,
              |         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
              |  FROM embeddings q CROSS JOIN embeddings e
              |  WHERE q.vec_id < 8 AND e.vec_id >= 8),
              |ex AS (
              |  SELECT q_id, vec_id, rnk AS re FROM (
              |    SELECT q_id, vec_id,
              |           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk
              |    FROM exscored) WHERE rnk <= 10),
              |nq AS (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries FROM ex),
              |ks AS (SELECT unnest([1, 5, 10]) AS k),
              |j AS (SELECT re, ra FROM ex JOIN ann USING (q_id, vec_id)),
              |h AS (SELECT k,
              |             CAST(COUNT(CASE WHEN re <= k AND ra <= k THEN 1 END) AS BIGINT) AS n_hits
              |      FROM ks LEFT JOIN j ON TRUE GROUP BY k),
              |exn AS (SELECT k,
              |               CAST(COUNT(CASE WHEN re <= k THEN 1 END) AS BIGINT) AS n_exact
              |        FROM ks LEFT JOIN ex ON TRUE GROUP BY k)
              |SELECT k, n_queries, n_hits,
              |       CASE WHEN n_exact > 0 THEN
              |         round(CAST(n_hits AS DOUBLE) / n_exact, 6) END AS recall
              |FROM h JOIN exn USING (k) CROSS JOIN nq ORDER BY k""".stripMargin)),

    // ── Fisher class-scatter decomposition
    //    (Similarity.embeddingClassScatter): per-label within-/between-
    //    class sums of squares and their ratio over fixed-point lane sums;
    //    the final double chain is an ascending-dim left fold mirrored via
    //    list_reduce, so the driver hashes the whole decomposition.
    ("embedding_class_scatter",
      (spark, dir) =>
        Similarity.embeddingClassScatter(Tables.embeddings(spark, dir)),
      Some {
        // shared double-chain fragments, interpolated so both quadratic
        // folds are written once and reused verbatim (the CASE arm must
        // repeat its operands textually)
        val muNorm2 =
          """list_reduce([CAST(0.0 AS DOUBLE)] ||
            |  list_transform(range(1, 65), p ->
            |    (CAST(s[p] AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0))
            |    * (CAST(s[p] AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0))),
            |  (a, b) -> a + b)""".stripMargin
        val within = s"""CAST(q AS DOUBLE) / 1000000000000.0
            |  - CAST(n AS DOUBLE) * $muNorm2""".stripMargin
        val between =
          """CAST(n AS DOUBLE) * list_reduce([CAST(0.0 AS DOUBLE)] ||
            |  list_transform(range(1, 65), p ->
            |    (CAST(s[p] AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
            |     - CAST(st[p] AS DOUBLE) / (CAST(nt AS DOUBLE) * 1000000.0))
            |    * (CAST(s[p] AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
            |       - CAST(st[p] AS DOUBLE) / (CAST(nt AS DOUBLE) * 1000000.0))),
            |  (a, b) -> a + b)""".stripMargin
        s"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
           |x AS (SELECT label, unnest(range(1, 65)) AS pos,
           |             CAST(round(unnest(emb) * 1000000.0) AS BIGINT) AS fp
           |      FROM e),
           |g AS (SELECT label, pos, CAST(SUM(fp) AS BIGINT) AS s FROM x GROUP BY 1, 2),
           |nq AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1),
           |qq AS (SELECT label, SUM(CAST(fp AS HUGEINT) * fp) AS q FROM x GROUP BY 1),
           |sa AS (SELECT label, list(s ORDER BY pos) AS s FROM g GROUP BY 1),
           |ta AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM nq),
           |sts AS (SELECT list(sg ORDER BY pos) AS st FROM
           |         (SELECT pos, CAST(SUM(s) AS BIGINT) AS sg FROM g GROUP BY 1)),
           |f AS (SELECT nq.label, n, q, s, nt, st
           |      FROM nq JOIN qq USING (label) JOIN sa USING (label)
           |      CROSS JOIN ta CROSS JOIN sts)
           |SELECT label, n AS n_vecs,
           |  round($within, 6) AS within_ss,
           |  round($between, 6) AS between_ss,
           |  CASE WHEN ($within) <> 0.0 THEN
           |    round(($between) / ($within), 6)
           |  END AS fisher_ratio
           |FROM f ORDER BY label""".stripMargin
      }),

    // ── k-center greedy coreset (Similarity.kCenterCoreset): 8 maximally
    //    diverse exemplars by farthest-point traversal — each round one
    //    scan-shaped literal-cosine aggregate; the twin unrolls the same
    //    7 stages, so the driver hashes the entire traversal (a wrong
    //    pick anywhere cascades).
    ("kcenter_coreset",
      (spark, dir) =>
        Similarity.kCenterCoreset(Tables.embeddings(spark, dir), k = 8)
          .orderBy(col("rank")),
      Some {
        val k = 8
        val stages = (2 to k).map { i =>
          // AS MATERIALIZED on every stage: DuckDB otherwise INLINES the
          // doubly-referenced sel chain — each sel_i expands sel_{i-1}
          // twice, 2^k plan blowup (measured 97 s vs 0.6 s at sf0.1)
          s"""p$i AS MATERIALIZED (SELECT c.vec_id, c.emb,
             |        MAX(round(list_cosine_similarity(c.emb, s.emb), 6)) AS ms
             |        FROM corpus c, sel${i - 1} s
             |        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
             |        GROUP BY c.vec_id, c.emb
             |        ORDER BY ms, c.vec_id LIMIT 1),
             |sel$i AS MATERIALIZED (SELECT vec_id, emb, rank, max_sim FROM sel${i - 1}
             |          UNION ALL SELECT vec_id, emb, CAST($i AS BIGINT) AS rank, ms AS max_sim FROM p$i)""".stripMargin
        }
        s"""WITH corpus AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
           |sel1 AS MATERIALIZED (SELECT vec_id, emb, CAST(1 AS BIGINT) AS rank, CAST(NULL AS DOUBLE) AS max_sim
           |         FROM (SELECT vec_id, emb FROM corpus ORDER BY vec_id LIMIT 1)),
           |${stages.mkString(",\n")}
           |SELECT rank, vec_id, max_sim FROM sel$k ORDER BY rank""".stripMargin
      }),

    // ── Embedding-norm audit (Similarity.embeddingNormStats): per-label
    //    vector counts, zero-norm counts, mean/median L2 norms in exact
    //    micro-units.
    ("embedding_norm_stats",
      (spark, dir) =>
        Similarity.embeddingNormStats(Tables.embeddings(spark, dir))
          .transform(CatalogCore.orderedReport(_, col("label"))),
      Some("""WITH n AS (
             |  SELECT label,
             |         CAST(round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) * 1e6) AS BIGINT) AS nm
             |  FROM embeddings)
             |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             |       CAST(SUM(CASE WHEN nm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
             |       round(CAST(SUM(nm) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mean_norm,
             |       round(quantile_cont(nm, 0.5) / 1e6, 6) AS p50_norm
             |FROM n GROUP BY 1 ORDER BY label""".stripMargin)),

    // ── Per-source language-mix entropy (TextAnalysis.sourceMixEntropy):
    //    corpus mix diversity per source, micro-nat exact sums.
    ("source_mix_entropy",
      (spark, dir) =>
        TextAnalysis.sourceMixEntropy(Tables.documents(spark, dir))
          .transform(CatalogCore.orderedReport(_, col("source"))),
      Some("""WITH bl AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
             |            FROM documents GROUP BY 1, 2),
             |tm AS (SELECT source, c,
             |              CAST(round(-(CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY source))
             |                         * ln(CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY source))
             |                         * 1e6) AS BIGINT) AS term
             |       FROM bl)
             |SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
             |       CAST(COUNT(*) AS BIGINT) AS n_langs,
             |       CAST(SUM(term) AS BIGINT) AS entropy_micronats,
             |       round(CAST(SUM(term) AS BIGINT) / 1e6, 6) AS entropy_nats
             |FROM tm GROUP BY 1 ORDER BY source""".stripMargin)),

    // ── Inter-order gap distribution (Stats.customerOrderGaps): days
    //    between consecutive orders per customer, one corpus-level report
    //    row with exact mean and percentiles.
    ("customer_order_gaps",
      (spark, dir) => Stats.customerOrderGaps(Tables.orders(spark, dir)),
      Some("""WITH o AS (SELECT o_custkey, o_orderkey,
             |                  CAST(o_orderdate AS DATE) AS day
             |           FROM orders),
             |g AS (SELECT o_custkey,
             |             date_diff('day',
             |               lag(day) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey),
             |               day) AS gap
             |      FROM o),
             |gg AS (SELECT o_custkey, gap FROM g WHERE gap IS NOT NULL)
             |SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
             |       CAST(COUNT(*) AS BIGINT) AS n_gaps,
             |       round(CAST(SUM(gap) AS DOUBLE) / COUNT(*), 6) AS mean_gap_days,
             |       round(quantile_cont(gap, 0.5), 6) AS p50_gap_days,
             |       round(quantile_cont(gap, 0.9), 6) AS p90_gap_days
             |FROM gg""".stripMargin)),

    // ── Per-user behavioral feature table (Stats.userFeatureTable):
    //    volume, purchase/error counts, type diversity with micro-nat
    //    entropy (exact BIGINT sum), active days, events/day.
    ("user_features",
      (spark, dir) =>
        Stats.userFeatureTable(Tables.events(spark, dir))
          .orderBy(col("user_id")),
      Some("""WITH bt AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
             |            FROM events GROUP BY 1, 2),
             |tm AS (SELECT user_id, event_type, c,
             |              CAST(round(-(CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY user_id))
             |                         * ln(CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY user_id))
             |                         * 1e6) AS BIGINT) AS term
             |       FROM bt),
             |mix AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
             |               CAST(COUNT(*) AS BIGINT) AS n_types,
             |               CAST(SUM(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END) AS BIGINT) AS n_purchases,
             |               CAST(SUM(CASE WHEN event_type = 'error' THEN c ELSE 0 END) AS BIGINT) AS n_errors,
             |               CAST(SUM(term) AS BIGINT) AS entropy_micronats
             |        FROM tm GROUP BY 1),
             |d AS (SELECT user_id, CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
             |      FROM events GROUP BY 1)
             |SELECT mix.user_id, n_events, n_purchases, n_errors, n_types,
             |       entropy_micronats, active_days,
             |       round(CAST(n_events AS DOUBLE) / active_days, 6) AS events_per_active_day
             |FROM mix JOIN d USING (user_id) ORDER BY user_id""".stripMargin)),

    // ── CUSUM mean-shift changepoint on daily revenue
    //    (Stats.cusumChangepoint): argmax |n·prefix − t·total| in exact
    //    wide-integer arithmetic, ties broken by day.
    ("revenue_cusum_changepoint",
      (spark, dir) => Stats.cusumChangepoint(Tables.orders(spark, dir)),
      Some(s"""WITH d AS ($sqlDailyRevenue),
              |c AS (SELECT day, rev_cents,
              |             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
              |             CAST(SUM(rev_cents) OVER (ORDER BY day
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix,
              |             CAST(COUNT(*) OVER () AS BIGINT) AS n,
              |             CAST(SUM(rev_cents) OVER () AS BIGINT) AS total
              |      FROM d),
              |s AS (SELECT *, CAST(prefix AS HUGEINT) * n - CAST(total AS HUGEINT) * t AS dd
              |      FROM c WHERE t < n)
              |SELECT n AS n_days, day AS cp_day, t AS cp_index,
              |       CAST(abs(dd) AS DOUBLE) AS max_abs_d,
              |       round(CAST(abs(dd) AS DOUBLE)
              |             / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)), 6) AS cusum_stat,
              |       (prefix * 2 + t) // (t * 2) AS mean_before_cents,
              |       ((total - prefix) * 2 + (n - t)) // ((n - t) * 2) AS mean_after_cents
              |FROM s ORDER BY abs(dd) DESC, day LIMIT 1""".stripMargin)),

    // ── Lagged-pairs autocorrelation of daily revenue at lags 1..7
    //    (Stats.dailyRevenueAcf): the weekly-cadence screen, exact BIGINT
    //    moments per lag (HUGEINT second moments in the twin — they outgrow
    //    BIGINT at replica scale).
    ("daily_revenue_acf",
      (spark, dir) => Stats.dailyRevenueAcf(Tables.orders(spark, dir)),
      Some {
        val branches = (1 to 7).map(i =>
          s"SELECT CAST($i AS BIGINT) AS lag, l$i AS x, y FROM l WHERE l$i IS NOT NULL")
          .mkString("\n      UNION ALL ")
        val lagCols = (1 to 7)
          .map(i => s"lag(rev_cents, $i) OVER (ORDER BY day) AS l$i").mkString(",\n             ")
        s"""WITH d AS ($sqlDailyRevenue),
           |l AS (SELECT rev_cents AS y,
           |             $lagCols
           |      FROM d),
           |p AS ($branches),
           |s AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
           |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           |             SUM(CAST(x AS HUGEINT) * x) AS sxx,
           |             SUM(CAST(y AS HUGEINT) * y) AS syy,
           |             SUM(CAST(x AS HUGEINT) * y) AS sxy
           |      FROM p GROUP BY 1)
           |SELECT lag, n,
           |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
           |         OR (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0
           |       THEN NULL
           |       ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           |            / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           |             * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           |  END AS acf,
           |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
           |       THEN NULL
           |       ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           |            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
           |  END AS slope
           |FROM s ORDER BY lag""".stripMargin
      }),

    // ── Seasonal-naive backtest (Stats.seasonalNaiveBacktest): x̂_t =
    //    x_{t−7}, residual profile in exact cents — the no-model forecast
    //    baseline.
    ("seasonal_naive_backtest",
      (spark, dir) => Stats.seasonalNaiveBacktest(Tables.orders(spark, dir)),
      Some(s"""WITH d AS ($sqlDailyRevenue),
              |s AS (SELECT rev_cents,
              |             rev_cents - lag(rev_cents, 7) OVER (ORDER BY day) AS err
              |      FROM d),
              |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
              |             CAST(SUM(abs(err)) AS BIGINT) AS sae,
              |             CAST(SUM(err) AS BIGINT) AS se,
              |             CAST(SUM(rev_cents) AS BIGINT) AS sy,
              |             round(quantile_cont(abs(err), 0.9), 6) AS p90_abs_err_cents
              |      FROM s WHERE err IS NOT NULL)
              |SELECT n_scored,
              |       (sae * 2 + n_scored) // (n_scored * 2) AS mae_cents,
              |       round(CAST(sae AS DOUBLE) / CAST(sy AS DOUBLE), 6) AS wape,
              |       round(CAST(se AS DOUBLE) / CAST(n_scored AS DOUBLE), 6) AS bias_cents,
              |       p90_abs_err_cents
              |FROM f""".stripMargin)),

    // ── Right-censored inter-order lifetable (Stats.orderGapHazard):
    //    Kaplan–Meier-style at-risk/event/censor counts and discrete hazard
    //    per 30-day bin — the unbiased time-to-return curve.
    ("order_gap_hazard",
      (spark, dir) => Stats.orderGapHazard(Tables.orders(spark, dir)),
      Some("""WITH base AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS day FROM orders),
             |g AS (SELECT CAST(date_diff('day',
             |               lag(day) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey),
             |               day) AS BIGINT) AS dur
             |      FROM base),
             |t AS (SELECT CAST(date_diff('day', MAX(day), (SELECT MAX(day) FROM base)) AS BIGINT) AS dur
             |      FROM base GROUP BY o_custkey),
             |u AS (SELECT dur // 30 AS bin, CAST(0 AS BIGINT) AS censored FROM g WHERE dur IS NOT NULL
             |      UNION ALL
             |      SELECT dur // 30 AS bin, CAST(1 AS BIGINT) AS censored FROM t),
             |b AS (SELECT bin, CAST(SUM(1 - censored) AS BIGINT) AS n_events,
             |             CAST(SUM(censored) AS BIGINT) AS n_censored
             |      FROM u GROUP BY 1),
             |r AS (SELECT *, CAST(SUM(n_events + n_censored) OVER (ORDER BY bin DESC
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_at_risk
             |      FROM b)
             |SELECT bin, bin * 30 AS bin_start_day, n_at_risk, n_events, n_censored,
             |       round(CAST(n_events AS DOUBLE) / CAST(n_at_risk AS DOUBLE), 6) AS hazard
             |FROM r ORDER BY bin""".stripMargin)),

    // ── Kaplan–Meier product-limit retention (Stats.kaplanMeierRetention):
    //    day-grain survival curve over the same right-censored inter-order
    //    spells as order_gap_hazard. The prefix product S(t) = Π(1 − d/n)
    //    is an ORDERED FOLD over the day-bounded event grid held as one
    //    array — Spark aggregate(filter(...)) and DuckDB
    //    list_reduce(list_transform(list_filter(...))) fold the identical
    //    IEEE doubles in identical ascending order, so the driver hashes
    //    the whole curve (rounding only in the final projection).
    ("kaplan_meier_retention",
      (spark, dir) => Stats.kaplanMeierRetention(Tables.orders(spark, dir)),
      Some("""WITH base AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS day FROM orders),
             |g AS (SELECT CAST(date_diff('day',
             |               lag(day) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey),
             |               day) AS BIGINT) AS dur
             |      FROM base),
             |t AS (SELECT CAST(date_diff('day', MAX(day), (SELECT MAX(day) FROM base)) AS BIGINT) AS dur
             |      FROM base GROUP BY o_custkey),
             |u AS (SELECT dur, CAST(0 AS BIGINT) AS censored FROM g WHERE dur IS NOT NULL
             |      UNION ALL
             |      SELECT dur, CAST(1 AS BIGINT) AS censored FROM t),
             |b AS (SELECT dur, CAST(SUM(1 - censored) AS BIGINT) AS d,
             |             CAST(SUM(censored) AS BIGINT) AS c
             |      FROM u GROUP BY 1),
             |r AS (SELECT *, CAST(SUM(d + c) OVER (ORDER BY dur DESC
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
             |      FROM b),
             |e AS (SELECT dur, d, c, n FROM r WHERE d > 0),
             |arr AS (SELECT list(struct_pack(dur := dur, d := d, n := n) ORDER BY dur) AS a FROM e)
             |SELECT e.dur AS dur_days, e.n AS n_at_risk, e.d AS n_events, e.c AS n_censored,
             |       round(CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE), 6) AS hazard,
             |       round(list_reduce(
             |         [CAST(1.0 AS DOUBLE)] || list_transform(
             |            list_filter(a, x -> x.dur <= e.dur),
             |            x -> 1.0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)),
             |         (p, q) -> p * q), 6) AS survival
             |FROM e CROSS JOIN arr
             |ORDER BY dur_days""".stripMargin)),

    // ── Mann–Whitney U rank test (Stats.mannWhitneyU): returned vs
    //    accepted lineitem quantities, tie-corrected normal approximation
    //    with exact doubled-rank arithmetic.
    ("mann_whitney_quantity",
      (spark, dir) =>
        Stats.mannWhitneyU(Tables.lineitem(spark, dir), "l_returnflag",
                           "R", "A", col("l_quantity").cast("long")),
      Some("""WITH c AS (SELECT CAST(l_quantity AS BIGINT) AS v,
             |                  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |                  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS c2
             |           FROM lineitem WHERE l_returnflag IN ('R', 'A') GROUP BY 1),
             |r AS (SELECT *, c1 + c2 AS c,
             |             COALESCE(CAST(SUM(c1 + c2) OVER (ORDER BY v
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
             |               CAST(0 AS BIGINT)) AS below
             |      FROM c),
             |a AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
             |             SUM(CAST(c1 AS HUGEINT) * (2 * below + c + 1)) AS r1x2,
             |             SUM(CAST(c AS HUGEINT) * c * c - c) AS ties3
             |      FROM r),
             |f AS (SELECT n1, n2,
             |             (CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0 AS u1,
             |             sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
             |                  ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
             |                   - CAST(ties3 AS DOUBLE)
             |                     / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
             |                        * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))) AS sigma
             |      FROM a)
             |SELECT n1, n2, u1,
             |       CASE WHEN sigma = 0 THEN NULL
             |            ELSE round((u1 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) / sigma, 6)
             |       END AS z,
             |       round(u1 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS auc
             |FROM f""".stripMargin)),

    // ── Floor-clamped wallet balance per user (Windows.cappedRunningBalance):
    //    the Lindley-reflection closed form of the sequential clamp fold —
    //    purchases credit, errors debit, balance can't go below zero.
    ("capped_running_balance",
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
          .filter(col("event_type").isin("purchase", "error"))
        val cents = Scalars.moneyCents(col("value"))
        val delta = when(col("event_type") === "purchase", cents)
          .otherwise(-cents)
        Windows.cappedRunningBalance(ev, "user_id", delta,
            Seq(col("ts"), col("event_id")))
          .orderBy(col("user_id"))
      },
      Some("""WITH d AS (
             |  SELECT user_id, event_id, ts,
             |         CASE WHEN event_type = 'purchase'
             |              THEN CAST(round(value * 100) AS BIGINT)
             |              ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
             |  FROM events WHERE event_type IN ('purchase', 'error')),
             |s1 AS (SELECT user_id, event_id, ts, delta,
             |              CAST(SUM(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS prefix,
             |              row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_desc
             |       FROM d),
             |s2 AS (SELECT user_id, prefix, rn_desc,
             |              least(CAST(0 AS BIGINT),
             |                    COALESCE(CAST(MIN(prefix) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
             |                      CAST(0 AS BIGINT))) AS runmin_prev
             |       FROM s1),
             |s3 AS (SELECT user_id, prefix, rn_desc,
             |              least(runmin_prev, prefix) AS runmin,
             |              prefix - least(runmin_prev, prefix) AS balance,
             |              CASE WHEN prefix < runmin_prev THEN 1 ELSE 0 END AS floor_hit
             |       FROM s2)
             |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_txns,
             |       CAST(MAX(CASE WHEN rn_desc = 1 THEN balance END) AS BIGINT) AS final_balance,
             |       CAST(MAX(CASE WHEN rn_desc = 1 THEN prefix END) AS BIGINT) AS net_sum,
             |       CAST(-MIN(runmin) AS BIGINT) AS floor_absorbed,
             |       CAST(SUM(floor_hit) AS BIGINT) AS n_floor_hits,
             |       CAST(MAX(balance) AS BIGINT) AS peak_balance
             |FROM s3 GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // ── Common-neighbor link prediction (Graph.linkPrediction) on the
    //    part-level co-purchase graph (edge = co-purchased in >= 2 orders;
    //    the supplier graph is complete at small SFs — no links to
    //    predict): top-50 non-adjacent part pairs by shared neighborhood.
    ("copurchase_link_prediction",
      (spark, dir) =>
        Graph.linkPrediction(Tables.lineitem(spark, dir),
                             "l_orderkey", "l_partkey", minSupport = 2, k = 50),
      Some("""WITH ds AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
             |e AS (SELECT a.it AS u, b.it AS v
             |      FROM ds a JOIN ds b ON a.bk = b.bk AND a.it < b.it
             |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |adj AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
             |deg AS (SELECT u AS x, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
             |cand AS (SELECT l.u AS u, r.u AS v, CAST(COUNT(*) AS BIGINT) AS common
             |         FROM adj l JOIN adj r ON l.v = r.v AND l.u < r.u
             |         GROUP BY 1, 2),
             |nc AS (SELECT * FROM cand c
             |       WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.u AND e.v = c.v))
             |SELECT nc.u, nc.v, common, d1.d AS du, d2.d AS dv,
             |       round(CAST(common AS DOUBLE) / CAST(d1.d + d2.d - common AS DOUBLE), 6) AS jaccard
             |FROM nc JOIN deg d1 ON d1.x = nc.u JOIN deg d2 ON d2.x = nc.v
             |ORDER BY common DESC, jaccard DESC, u, v LIMIT 50""".stripMargin)),

    // ── SymSpell deletion-neighborhood fuzzy match (Dedup.symDeleteMatch):
    //    deterministically perturbed customer names resolved back against
    //    the clean list at lev ≤ 1 — equi-join-only ER with provable recall.
    ("symdelete_fuzzy_match",
      (spark, dir) => {
        // spread: the 19x variant explode + levenshtein verify otherwise
        // run at the single-file scan's parallelism (measured: two ~1 s
        // single-task jobs at sf0.1)
        val cust = Tables.spread(Tables.customer(spark, dir), col("c_custkey"))
        val len = length(col("c_name"))
        val p = (col("c_custkey") % len.cast("long")).cast("int") + lit(1)
        val dirty = cust.select(
          col("c_custkey").as("dirty_id"), col("c_custkey").as("source_id"),
          concat(col("c_name").substr(lit(1), p - 1),
                 col("c_name").substr(p + 1, len - p)).as("dirty_name"))
        val clean = cust.select(col("c_custkey").as("clean_id"),
                                col("c_name").as("clean_name"))
        Dedup.symDeleteMatch(dirty, clean).orderBy(col("dirty_id"))
      },
      Some("""WITH clean AS (SELECT c_custkey AS clean_id, c_name AS clean_name FROM customer),
             |dirty AS (SELECT c_custkey AS dirty_id, c_custkey AS source_id,
             |                 substring(c_name, 1, CAST(c_custkey % length(c_name) AS INT)) ||
             |                 substring(c_name, CAST(c_custkey % length(c_name) AS INT) + 2,
             |                           length(c_name) - CAST(c_custkey % length(c_name) AS INT) - 1) AS dirty_name
             |          FROM customer),
             |dv AS (SELECT dirty_id, dirty_name,
             |              unnest(list_transform(range(0, length(dirty_name) + 1),
             |                i -> CASE WHEN i = 0 THEN dirty_name
             |                          ELSE substring(dirty_name, 1, CAST(i - 1 AS INT)) ||
             |                               substring(dirty_name, CAST(i + 1 AS INT),
             |                                         length(dirty_name) - CAST(i AS INT)) END)) AS key
             |       FROM dirty),
             |cv AS (SELECT clean_id, clean_name,
             |              unnest(list_transform(range(0, length(clean_name) + 1),
             |                i -> CASE WHEN i = 0 THEN clean_name
             |                          ELSE substring(clean_name, 1, CAST(i - 1 AS INT)) ||
             |                               substring(clean_name, CAST(i + 1 AS INT),
             |                                         length(clean_name) - CAST(i AS INT)) END)) AS key
             |       FROM clean),
             |cd AS (SELECT DISTINCT d.dirty_id, d.dirty_name, c.clean_id, c.clean_name
             |       FROM dv d JOIN cv c USING (key)
             |       WHERE levenshtein(d.dirty_name, c.clean_name) <= 1),
             |pd AS (SELECT dirty_id, CAST(COUNT(*) AS BIGINT) AS n_candidates,
             |              CAST(MIN(levenshtein(dirty_name, clean_name)) AS BIGINT) AS min_dist
             |       FROM cd GROUP BY 1),
             |rec AS (SELECT DISTINCT cd.dirty_id
             |        FROM cd JOIN dirty ON cd.dirty_id = dirty.dirty_id
             |        WHERE cd.clean_id = dirty.source_id)
             |SELECT d.dirty_id,
             |       COALESCE(pd.n_candidates, CAST(0 AS BIGINT)) AS n_candidates,
             |       pd.min_dist,
             |       CASE WHEN rec.dirty_id IS NOT NULL THEN true ELSE false END AS source_recovered
             |FROM dirty d
             |LEFT JOIN pd ON d.dirty_id = pd.dirty_id
             |LEFT JOIN rec ON d.dirty_id = rec.dirty_id
             |ORDER BY d.dirty_id""".stripMargin)),

    // ── Gaps-and-islands run collapse (Windows.stateIslands): maximal
    //    same-event-type runs per user — the SCD-2 validity-interval
    //    builder over a change log.
    ("event_type_islands",
      (spark, dir) =>
        Windows.stateIslands(Tables.events(spark, dir), "user_id", "ts",
            "event_type", col("event_id"))
          .orderBy(col("user_id"), col("island")),
      Some("""WITH m AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |               OR lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) <> event_type
             |              THEN 1 ELSE 0 END AS chg
             |  FROM events),
             |s AS (
             |  SELECT user_id, event_type, ts,
             |         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
             |  FROM m)
             |SELECT user_id, island, MAX(event_type) AS state,
             |       MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS start_epoch,
             |       MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS end_epoch,
             |       COUNT(*) AS n_events
             |FROM s GROUP BY 1, 2 ORDER BY user_id, island""".stripMargin)),

    // ── Trailing 7-day distinct active users (Windows.rollingDistinct):
    //    exact sliding-window COUNT(DISTINCT) via cover-set expansion of
    //    deduped (day, user) pairs.
    ("rolling_active_users",
      (spark, dir) =>
        Windows.rollingDistinct(Tables.events(spark, dir), "user_id",
            to_date(col("ts")), 7)
          .orderBy(col("day")),
      Some("""WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
             |g AS (SELECT DISTINCT day FROM p)
             |SELECT g.day, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS distinct_7d
             |FROM g JOIN p ON p.day BETWEEN g.day - 6 AND g.day
             |GROUP BY 1 ORDER BY g.day""".stripMargin)),

    // ── k-anonymity audit (Scrub.kAnonymityAudit) over the customer
    //    quasi-identifier tuple (nation, segment, $1000 balance bucket):
    //    equivalence-class structure + rows re-identifiable below k = 5.
    //    Bucket via floor of a double division (truncating `div` and
    //    flooring `//` disagree on the negative balances this corpus has).
    ("k_anonymity_audit",
      (spark, dir) => {
        val bucket = floor(Scalars.moneyCents(col("c_acctbal")).cast("double")
                             / lit(100000.0))
        Scrub.kAnonymityAudit(
          Tables.customer(spark, dir)
            .select(col("c_nationkey"), col("c_mktsegment"),
                    bucket.as("bal_bucket")),
          Seq(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket")), 5)
      },
      Some("""WITH q AS (SELECT c_nationkey, c_mktsegment,
             |                  CAST(floor(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)
             |                             / 100000.0) AS BIGINT) AS bal_bucket
             |           FROM customer),
             |cls AS (SELECT c_nationkey, c_mktsegment, bal_bucket,
             |               CAST(COUNT(*) AS BIGINT) AS sz
             |        FROM q GROUP BY 1, 2, 3)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
             |       CAST(SUM(sz) AS BIGINT) AS n_rows,
             |       CAST(MIN(sz) AS BIGINT) AS min_class_size,
             |       CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_k,
             |       CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS rows_below_k,
             |       round(CAST(SUM(sz) AS DOUBLE) / COUNT(*), 6) AS mean_class_size
             |FROM cls""".stripMargin)),

    // ── First-order Markov transition matrix of the per-user event stream
    //    (Windows.transitionMatrix): (from, to) counts + row-normalized
    //    probabilities over the ≤|types|² matrix.
    ("event_transition_matrix",
      (spark, dir) =>
        Windows.transitionMatrix(Tables.events(spark, dir), "user_id", "ts",
            "event_type", col("event_id"))
          .orderBy(col("from_state"), col("to_state")),
      Some("""WITH m AS (
             |  SELECT user_id, event_type,
             |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_state
             |  FROM events),
             |c AS (SELECT from_state, event_type AS to_state, CAST(COUNT(*) AS BIGINT) AS n
             |      FROM m WHERE from_state IS NOT NULL GROUP BY 1, 2)
             |SELECT from_state, to_state, n,
             |       round(CAST(n AS DOUBLE)
             |             / CAST(CAST(SUM(n) OVER (PARTITION BY from_state) AS BIGINT) AS DOUBLE), 6) AS p
             |FROM c ORDER BY from_state, to_state""".stripMargin)),

    // ── Two-stage funnel conversion latency (Windows.funnelLatency):
    //    first view → first at-or-after purchase per user, exact
    //    integer-second latency profile.
    ("funnel_latency",
      (spark, dir) =>
        Windows.funnelLatency(Tables.events(spark, dir), "user_id", "ts",
                              "event_type", "view", "purchase"),
      Some("""WITH ff AS (SELECT user_id, MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t_from
             |            FROM events WHERE event_type = 'view' GROUP BY 1),
             |cv AS (SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t_conv
             |       FROM events e JOIN ff ON e.user_id = ff.user_id
             |       WHERE e.event_type = 'purchase'
             |         AND CAST(floor(epoch(e.ts)) AS BIGINT) >= ff.t_from
             |       GROUP BY 1),
             |l AS (SELECT cv.t_conv - ff.t_from AS latency_s
             |      FROM cv JOIN ff ON cv.user_id = ff.user_id)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
             |       round(CAST(SUM(latency_s) AS DOUBLE) / COUNT(*), 6) AS mean_latency_s,
             |       round(quantile_cont(latency_s, 0.5), 6) AS p50_latency_s,
             |       round(quantile_cont(latency_s, 0.9), 6) AS p90_latency_s
             |FROM l""".stripMargin)),

    // ── Linear multi-touch attribution (Allocate.linearAttribution):
    //    each purchase's 10⁶ micro-credits split across its prior-7-day
    //    view/click touches via largest remainder — credit conserved to
    //    the unit, no-touch purchases itemized.
    ("linear_attribution",
      (spark, dir) =>
        Allocate.linearAttribution(Tables.events(spark, dir))
          .orderBy(col("touch_type")),
      Some("""WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
             |           FROM events WHERE event_type = 'purchase'),
             |t AS (SELECT user_id, event_id AS t_id, event_type AS touch_type, epoch_us(ts) AS t_us
             |      FROM events WHERE event_type IN ('view', 'click')),
             |pr AS (SELECT p.p_id, t.touch_type, t.t_us, t.t_id
             |       FROM p JOIN t ON p.user_id = t.user_id
             |        AND t.t_us >= p.p_us - 604800000000 AND t.t_us < p.p_us),
             |w AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY p_id) AS BIGINT) AS n,
             |             row_number() OVER (PARTITION BY p_id ORDER BY t_us, t_id) AS rk
             |      FROM pr),
             |a AS (SELECT touch_type,
             |             1000000 // n + CASE WHEN rk <= 1000000 % n THEN 1 ELSE 0 END AS credit
             |      FROM w)
             |SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
             |       CAST(SUM(credit) AS BIGINT) AS credit_micro
             |FROM a GROUP BY 1
             |UNION ALL
             |SELECT '(unattributed)', CAST(COUNT(*) AS BIGINT),
             |       CAST(COUNT(*) AS BIGINT) * 1000000
             |FROM p WHERE NOT EXISTS (SELECT 1 FROM pr WHERE pr.p_id = p.p_id)
             |ORDER BY touch_type""".stripMargin)),

    // ── χ² keyness of src0's vocabulary vs the rest of the corpus
    //    (TextAnalysis.keynessChi2): top-50 most source-distinctive terms
    //    with over/under-representation direction.
    ("keyness_chi2_terms",
      (spark, dir) =>
        TextAnalysis.keynessChi2(Tables.documents(spark, dir), "src0", 50),
      Some(s"""WITH t AS (SELECT source, unnest($sqlTokens) AS token FROM documents),
              |c AS (SELECT token,
              |             CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS a,
              |             CAST(SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS b
              |      FROM t GROUP BY 1),
              |tot AS (SELECT CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(b) AS BIGINT) AS tb FROM c)
              |SELECT token, a, b,
              |       CASE WHEN (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
              |                 * (CAST(ta - a AS DOUBLE) + CAST(tb - b AS DOUBLE))
              |                 * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) = 0 THEN NULL
              |            ELSE round((CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))
              |                       * (CAST(a AS DOUBLE) * CAST(tb - b AS DOUBLE)
              |                          - CAST(b AS DOUBLE) * CAST(ta - a AS DOUBLE))
              |                       * (CAST(a AS DOUBLE) * CAST(tb - b AS DOUBLE)
              |                          - CAST(b AS DOUBLE) * CAST(ta - a AS DOUBLE))
              |                       / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
              |                          * (CAST(ta - a AS DOUBLE) + CAST(tb - b AS DOUBLE))
              |                          * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 6)
              |       END AS chi2,
              |       CASE WHEN a * tb > b * ta THEN 1
              |            WHEN a * tb < b * ta THEN -1 ELSE 0 END AS direction
              |FROM c CROSS JOIN tot
              |ORDER BY chi2 DESC, token LIMIT 50""".stripMargin)),

    // ── SQ8 scalar-quantization ANN (Similarity.sq8TopK): per-dimension
    //    L2-normalize, micro-unit grid, 8-bit codes against the
    //    corpus-trained BIGINT ladder, ranking on the decoded integer dot
    //    (cosine after normalization) — the faiss-SQ8 deployment shape.
    ("sq8_ann_topk",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.sq8TopK(emb.filter(col("vec_id") < 8),
                           emb.filter(col("vec_id") >= 8), 5)
          .transform(CatalogCore.orderedReport(_,
            col("q_id"), col("approx_cos").desc, col("vec_id")))
      },
      Some(s"""WITH $sqlSq8Ctes
              |SELECT q_id, vec_id, approx_cos FROM s
              |QUALIFY row_number() OVER (PARTITION BY q_id
              |          ORDER BY approx_cos DESC, vec_id) <= 5
              |ORDER BY q_id, approx_cos DESC, vec_id""".stripMargin)),

    // ── SQ8 recall vs the exact cosine top-k (Similarity.sq8Recall): the
    //    quantization-loss eval for the row above, fused into one corpus
    //    scan on the Spark side.
    ("sq8_recall",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.sq8Recall(emb.filter(col("vec_id") < 8),
                             emb.filter(col("vec_id") >= 8), 5)
          .transform(CatalogCore.orderedReport(_, col("q_id")))
      },
      Some(s"""WITH $sqlSq8Ctes,
              |sqtop AS (
              |  SELECT q_id, vec_id FROM s
              |  QUALIFY row_number() OVER (PARTITION BY q_id
              |            ORDER BY approx_cos DESC, vec_id) <= 5),
              |exscored AS (
              |  SELECT qq.vec_id AS q_id, e.vec_id,
              |         round(list_cosine_similarity(CAST(qq.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
              |  FROM embeddings qq CROSS JOIN embeddings e
              |  WHERE qq.vec_id < 8 AND e.vec_id >= 8),
              |ex AS (
              |  SELECT q_id, vec_id FROM exscored
              |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) <= 5)
              |SELECT ex.q_id, COUNT(*) AS n_exact,
              |       CAST(SUM(CASE WHEN sqtop.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
              |       CAST(SUM(CASE WHEN sqtop.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
              |         / COUNT(*) AS recall
              |FROM ex LEFT JOIN sqtop ON ex.q_id = sqtop.q_id AND ex.vec_id = sqtop.vec_id
              |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin)),

    // ── Poisson-bootstrap 95% CI of mean daily revenue
    //    (Stats.bootstrapMeanCi): 200 hash-deterministic resamples, weights
    //    from integer threshold comparisons — no RNG, no engine float
    //    surface in the weights.
    ("bootstrap_mean_ci",
      (spark, dir) => Stats.bootstrapMeanCi(Tables.orders(spark, dir)),
      Some {
        val Seq(t0, t1, t2, t3, t4) = Stats.PoissonThresholds
        s"""WITH d AS ($sqlDailyRevenue),
           |x AS (SELECT day, rev_cents, unnest(range(0, 201)) AS b FROM d),
           |wgt AS (SELECT rev_cents, b,
           |               CAST(CAST('0x' || substr(md5(CAST(day AS VARCHAR) || '#' || CAST(b AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) AS h
           |        FROM x),
           |ww AS (SELECT rev_cents, b,
           |              CASE WHEN h < $t0 THEN 0 WHEN h < $t1 THEN 1
           |                   WHEN h < $t2 THEN 2 WHEN h < $t3 THEN 3
           |                   WHEN h < $t4 THEN 4 ELSE 5 END AS w
           |       FROM wgt),
           |m AS (SELECT CAST(SUM(w * rev_cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS m
           |      FROM ww GROUP BY b HAVING SUM(w) > 0),
           |base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           |                CAST(SUM(rev_cents) AS BIGINT) AS s
           |         FROM d)
           |SELECT n_days, (s * 2 + n_days) // (n_days * 2) AS mean_cents,
           |       (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_boot,
           |       (SELECT quantile_cont(m, 0.025) FROM m) AS ci_lo_cents,
           |       (SELECT quantile_cont(m, 0.975) FROM m) AS ci_hi_cents
           |FROM base""".stripMargin
      }),

    // ── Largest-remainder (Hamilton) proration (Allocate.largestRemainder):
    //    each order's header total allocated across its lineitems
    //    proportional to quantity, cents conserved exactly per order.
    ("largest_remainder_alloc",
      (spark, dir) => {
        // spreadHash on the group key: a single-row-group lineitem scan
        // otherwise decodes serially AND the exchange satisfies the
        // window's PARTITION BY l_orderkey distribution (the broadcast
        // order join is partitioning-preserving) — no-op at real scale
        val li = Tables.spreadHash(
          Tables.lineitem(spark, dir)
            .select(col("l_orderkey"), col("l_linenumber"),
                    col("l_quantity").cast("long").as("qty")),
          col("l_orderkey"))
        val o = Tables.orders(spark, dir)
          .select(col("o_orderkey"),
                  Scalars.moneyCents(col("o_totalprice")).as("total_cents"))
        // tiebreak (linenumber, qty): the synthetic lineitem repeats
        // linenumbers within an order, and two equal-remainder rows with
        // different qty must not swap their bump across engines
        Allocate.largestRemainder(
            li.join(o, col("l_orderkey") === col("o_orderkey")),
            "l_orderkey", col("total_cents"), col("qty"),
            Seq(col("l_linenumber"), col("qty")))
          .select(col("l_orderkey"), col("l_linenumber"), col("qty"),
                  col("alloc").as("alloc_cents"), col("bumped"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("qty"),
                   col("bumped"))
      },
      Some("""WITH j AS (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
             |                  CAST(round(o_totalprice * 100) AS BIGINT) AS total
             |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |w AS (SELECT *, CAST(SUM(qty) OVER (PARTITION BY l_orderkey) AS BIGINT) AS wsum FROM j),
             |s AS (SELECT *, (total * qty) // wsum AS share,
             |             total * qty - ((total * qty) // wsum) * wsum AS rem
             |      FROM w),
             |t AS (SELECT *, CAST(total - SUM(share) OVER (PARTITION BY l_orderkey) AS BIGINT) AS leftover,
             |             row_number() OVER (PARTITION BY l_orderkey ORDER BY rem DESC, l_linenumber, qty) AS rk
             |      FROM s)
             |SELECT l_orderkey, l_linenumber, qty,
             |       CAST(share + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc_cents,
             |       rk <= leftover AS bumped
             |FROM t ORDER BY l_orderkey, l_linenumber, qty, bumped""".stripMargin)),

    // ── Rank-windowed Theil–Sen trend (Stats.theilSenTrend): median of
    //    pairwise daily-revenue slopes within 90 rank positions — the
    //    robust slope one spike day cannot drag. Median by rank SELECTION
    //    (two middle order statistics), slopes emitted unrounded (they
    //    pass the round(…,6) 15-digit edge at replica scale).
    ("theil_sen_trend",
      (spark, dir) => Stats.theilSenTrend(Tables.orders(spark, dir)),
      Some(s"""WITH d AS ($sqlDailyRevenue),
              |t AS (SELECT day, rev_cents,
              |             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
              |      FROM d),
              |p AS (SELECT b.rev_cents - a.rev_cents AS drev,
              |             CAST(b.rev_cents - a.rev_cents AS DOUBLE)
              |               / CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope
              |      FROM t a JOIN t b ON b.t - a.t BETWEEN 1 AND 90),
              |r AS (SELECT drev, slope,
              |             CAST(row_number() OVER (ORDER BY slope) AS BIGINT) AS rn,
              |             CAST(COUNT(*) OVER () AS BIGINT) AS np
              |      FROM p),
              |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
              |             CAST(SUM(CASE WHEN drev > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
              |             CAST(SUM(CASE WHEN drev = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
              |             CAST(SUM(CASE WHEN drev < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
              |             MIN(CASE WHEN rn = (np + 1) // 2 THEN slope END) AS slope_lo,
              |             MIN(CASE WHEN rn = np // 2 + 1 THEN slope END) AS slope_hi
              |      FROM r),
              |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d)
              |SELECT n_days, n_pairs, n_up, n_flat, n_down, slope_lo, slope_hi,
              |       (slope_lo + slope_hi) / CAST(2 AS DOUBLE) AS sen_slope
              |FROM s CROSS JOIN nd""".stripMargin)),

    // ── CUPED variance-reduced A/B lift (Stats.cupedAdjustedLift):
    //    pre-period spend as the covariate, deterministic hash-split arms,
    //    θ from the exact-moment OLS fit (HUGEINT second moments in the
    //    twin — per-customer cent totals square past 2⁶³ at replica scale).
    ("cuped_adjusted_lift",
      (spark, dir) => Stats.cupedAdjustedLift(Tables.orders(spark, dir)),
      Some(s"""WITH per AS (
              |  SELECT o_custkey,
              |         CAST(SUM(CASE WHEN o_orderdate < DATE '1996-01-01'
              |                       THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
              |         CAST(SUM(CASE WHEN o_orderdate >= DATE '1996-01-01'
              |                       THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
              |         ${sqlHashBucket("o_custkey", 2)} AS arm
              |  FROM orders GROUP BY 1),
              |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
              |             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
              |             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
              |             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
              |      FROM per),
              |f AS (SELECT
              |  CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
              |         OR (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0
              |       THEN NULL
              |       ELSE round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |            / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |             * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
              |  END AS corr,
              |  CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
              |       THEN NULL
              |       ELSE round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
              |  END AS theta
              |  FROM m),
              |a AS (SELECT
              |  CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
              |  CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
              |  CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_t,
              |  CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_t,
              |  CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_c,
              |  CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_c
              |  FROM per)
              |SELECT n_treat, n_ctrl, theta, round(corr * corr, 6) AS rho2,
              |       CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
              |         round(CAST(sy_t AS DOUBLE) / CAST(n_treat AS DOUBLE), 6) END AS mean_y_treat,
              |       CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
              |         round(CAST(sy_c AS DOUBLE) / CAST(n_ctrl AS DOUBLE), 6) END AS mean_y_ctrl,
              |       CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
              |         round(CAST(sy_t AS DOUBLE) / CAST(n_treat AS DOUBLE)
              |               - CAST(sy_c AS DOUBLE) / CAST(n_ctrl AS DOUBLE), 6) END AS raw_lift,
              |       CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
              |         round((CAST(sy_t AS DOUBLE) / CAST(n_treat AS DOUBLE)
              |                - theta * (CAST(sx_t AS DOUBLE) / CAST(n_treat AS DOUBLE)))
              |               - (CAST(sy_c AS DOUBLE) / CAST(n_ctrl AS DOUBLE)
              |                  - theta * (CAST(sx_c AS DOUBLE) / CAST(n_ctrl AS DOUBLE))), 6) END AS adj_lift
              |FROM a CROSS JOIN f""".stripMargin)),

    // ── Distinct l-diversity audit (Scrub.lDiversityAudit) over the same
    //    customer quasi-identifier tuple as k_anonymity_audit, sensitive
    //    attribute = market segment, l = 3: the homogeneity-attack gate
    //    k-anonymity alone cannot close.
    ("l_diversity_audit",
      (spark, dir) => {
        val bucket = floor(Scalars.moneyCents(col("c_acctbal")).cast("double")
                             / lit(100000.0))
        Scrub.lDiversityAudit(
          Tables.customer(spark, dir)
            .select(col("c_nationkey"), col("c_mktsegment"),
                    bucket.as("bal_bucket")),
          Seq(col("c_nationkey"), col("bal_bucket")), col("c_mktsegment"), 3)
      },
      Some("""WITH q AS (SELECT c_nationkey, c_mktsegment,
             |                  CAST(floor(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)
             |                             / 100000.0) AS BIGINT) AS bal_bucket
             |           FROM customer),
             |cls AS (SELECT c_nationkey, bal_bucket,
             |               CAST(COUNT(*) AS BIGINT) AS sz,
             |               CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS dv
             |        FROM q GROUP BY 1, 2)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
             |       CAST(SUM(sz) AS BIGINT) AS n_rows,
             |       CAST(MIN(dv) AS BIGINT) AS min_diversity,
             |       CAST(SUM(CASE WHEN dv < 3 THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_l,
             |       CAST(SUM(CASE WHEN dv < 3 THEN sz ELSE 0 END) AS BIGINT) AS rows_below_l,
             |       round(CAST(SUM(dv) AS DOUBLE) / COUNT(*), 6) AS mean_diversity
             |FROM cls""".stripMargin)),

    // ── ANN NDCG curve (Similarity.annNdcgCurve): rank-position quality of
    //    the sign-LSH ANN at k = 1/5/10 — integer log2-discount gains
    //    (literals injected into BOTH engines), micro-averaged Σdcg/Σidcg.
    ("ann_ndcg",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.annNdcgCurve(emb.filter(col("vec_id") < 8),
                                emb.filter(col("vec_id") >= 8))
      },
      Some {
        val disc = Similarity.ndcgDiscountsMicro(10)
        val discList = disc.mkString("[", ", ", "]")
        s"""WITH ${sqlSignBuckets(8, 4)},
           |cand AS (
           |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS vec_id
           |  FROM buckets q JOIN buckets c ON q.t = c.t AND q.bucket = c.bucket
           |  WHERE q.vec_id < 8 AND c.vec_id >= 8),
           |annscored AS (
           |  SELECT cand.q_id, cand.vec_id, ${sqlCos("eq", "ec")} AS cos_sim
           |  FROM cand
           |  JOIN embeddings eq ON cand.q_id = eq.vec_id
           |  JOIN embeddings ec ON cand.vec_id = ec.vec_id),
           |ann AS (
           |  SELECT q_id, vec_id, rnk AS ra FROM (
           |    SELECT q_id, vec_id,
           |           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk
           |    FROM annscored) WHERE rnk <= 10),
           |exscored AS (
           |  SELECT q.vec_id AS q_id, e.vec_id,
           |         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim
           |  FROM embeddings q CROSS JOIN embeddings e
           |  WHERE q.vec_id < 8 AND e.vec_id >= 8),
           |ex AS (
           |  SELECT q_id, vec_id, rnk AS re FROM (
           |    SELECT q_id, vec_id,
           |           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rnk
           |    FROM exscored) WHERE rnk <= 10),
           |nq AS (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries FROM ex),
           |ks AS (SELECT unnest([1, 5, 10]) AS k),
           |j AS (SELECT re, ra FROM ex JOIN ann USING (q_id, vec_id)),
           |dd AS (SELECT k,
           |              CAST(SUM(CASE WHEN re <= k AND ra <= k
           |                            THEN $discList[CAST(ra AS INT)] ELSE 0 END) AS BIGINT) AS dcg_micro
           |       FROM ks LEFT JOIN j ON TRUE GROUP BY k),
           |ii AS (SELECT k,
           |              CAST(SUM(CASE WHEN re <= k
           |                            THEN $discList[CAST(re AS INT)] ELSE 0 END) AS BIGINT) AS idcg_micro
           |       FROM ks LEFT JOIN ex ON TRUE GROUP BY k)
           |SELECT k, n_queries, dcg_micro, idcg_micro,
           |       CASE WHEN idcg_micro > 0 THEN
           |         round(CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE), 6) END AS ndcg
           |FROM dd JOIN ii USING (k) CROSS JOIN nq ORDER BY k""".stripMargin
      }),

    // ── Language×source mutual information (TextAnalysis.langSourceMi):
    //    how much the source labels leak the language mix — the
    //    second-order confound screen behind sourceMixEntropy, micro-nat
    //    exact cell terms over the bounded label grid.
    ("lang_source_mi",
      (spark, dir) => TextAnalysis.langSourceMi(Tables.documents(spark, dir)),
      Some("""WITH cells AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
             |               FROM documents
             |               WHERE lang IS NOT NULL AND source IS NOT NULL
             |               GROUP BY 1, 2),
             |g AS (SELECT c,
             |             CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS cx,
             |             CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS cy,
             |             CAST(SUM(c) OVER () AS BIGINT) AS n
             |      FROM cells),
             |t AS (SELECT n,
             |             CAST(round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             |                        * ln((CAST(n AS DOUBLE) * CAST(c AS DOUBLE))
             |                             / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))
             |                        * 1e6) AS BIGINT) AS term
             |      FROM g)
             |SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
             |       CAST(COUNT(*) AS BIGINT) AS n_cells,
             |       CAST(SUM(term) AS BIGINT) AS mi_micronats,
             |       round(CAST(SUM(term) AS BIGINT) / 1e6, 6) AS mi_nats
             |FROM t""".stripMargin)),

    // ── Two-sample Kolmogorov–Smirnov drift (TextAnalysis.ksSourceDrift)
    //    between src0 and src1 n_chars distributions: the supremum located
    //    by exact integer cross-multiplication, one mirrored division.
    // ── Exact Wasserstein-1 source drift (TextAnalysis
    //    .wassersteinSourceDrift): area between the two empirical CDFs on
    //    the merged grid — integer cross-multiplied CDF gaps, decimal/
    //    HUGEINT area accumulator, one mirrored division.
    ("wasserstein_source_drift",
      (spark, dir) =>
        TextAnalysis.wassersteinSourceDrift(
          Tables.documents(spark, dir), "src0", "src1"),
      Some("""WITH g AS (SELECT CAST(n_chars AS BIGINT) AS v,
             |                  CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |                  CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS b
             |           FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
             |c AS (SELECT v,
             |             CAST(SUM(a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
             |             CAST(SUM(b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
             |             CAST(SUM(a) OVER () AS BIGINT) AS na,
             |             CAST(SUM(b) OVER () AS BIGINT) AS nb,
             |             COALESCE(lead(v) OVER (ORDER BY v) - v, 0) AS gap
             |      FROM g),
             |f AS (SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
             |             CAST(COUNT(*) AS BIGINT) AS grid_points,
             |             SUM(CAST(abs(ca * nb - cb * na) AS HUGEINT) * gap) AS area
             |      FROM c)
             |SELECT n_a, n_b, grid_points,
             |       CASE WHEN n_a > 0 AND n_b > 0 AND area IS NOT NULL THEN
             |         round(CAST(area AS DOUBLE)
             |               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
             |       END AS w1_distance
             |FROM f WHERE n_a IS NOT NULL""".stripMargin)),

    ("ks_source_drift",
      (spark, dir) =>
        TextAnalysis.ksSourceDrift(Tables.documents(spark, dir), "src0", "src1"),
      Some("""WITH g AS (SELECT CAST(n_chars AS BIGINT) AS v,
             |                  CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |                  CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS b
             |           FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
             |c AS (SELECT v,
             |             CAST(SUM(a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
             |             CAST(SUM(b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
             |             CAST(SUM(a) OVER () AS BIGINT) AS na,
             |             CAST(SUM(b) OVER () AS BIGINT) AS nb
             |      FROM g),
             |m AS (SELECT *, abs(ca * nb - cb * na) AS dnum FROM c)
             |SELECT na AS n_a, nb AS n_b, v AS d_at_value,
             |       CAST(dnum AS BIGINT) AS d_numerator,
             |       CASE WHEN na > 0 AND nb > 0 THEN
             |         round(CAST(dnum AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
             |       END AS ks_d,
             |       CASE WHEN na > 0 AND nb > 0 THEN
             |         round((CAST(dnum AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
             |               / sqrt(CAST(na + nb AS DOUBLE)
             |                      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 6)
             |       END AS ks_scaled
             |FROM m ORDER BY dnum DESC, v LIMIT 1""".stripMargin)),

    // ── Wald SPRT conversion monitor (Stats.sprtConversionMonitor):
    //    sequential H₀ p=0.18 vs H₁ p=0.22 over the daily urgent-order
    //    rate — all-BIGINT micro-nat walk (coefficients injected into both
    //    engines), first Wald-boundary crossing + final state.
    ("sprt_conversion_monitor",
      (spark, dir) => Stats.sprtConversionMonitor(Tables.orders(spark, dir)),
      Some {
        val (w1, w0, up, lo) = Stats.sprtCoefficients(0.18, 0.22, 0.05, 0.05)
        s"""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
           |                  CAST(COUNT(*) AS BIGINT) AS n,
           |                  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS s
           |           FROM orders GROUP BY 1),
           |c AS (SELECT day, n, s,
           |             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
           |             CAST(SUM(s * ($w1) + (n - s) * ($w0))
           |                  OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS llr
           |      FROM d),
           |f AS (SELECT 1 AS k, day AS decision_day, t AS decision_index,
           |             llr AS decision_llr_micronats,
           |             CASE WHEN llr >= $up THEN 'accept_h1' ELSE 'accept_h0' END AS decision
           |      FROM c WHERE llr >= $up OR llr <= $lo ORDER BY day LIMIT 1),
           |l AS (SELECT 1 AS k, llr AS final_llr_micronats FROM c ORDER BY day DESC LIMIT 1),
           |a AS (SELECT 1 AS k, CAST(COUNT(*) AS BIGINT) AS n_days,
           |             CAST(SUM(n) AS BIGINT) AS n_trials,
           |             CAST(SUM(s) AS BIGINT) AS n_successes
           |      FROM c)
           |SELECT n_days, n_trials, n_successes,
           |       COALESCE(decision, 'continue') AS decision,
           |       decision_day, decision_index, decision_llr_micronats,
           |       final_llr_micronats
           |FROM a LEFT JOIN f USING (k) LEFT JOIN l USING (k)""".stripMargin
      }),

    // ── Shapley channel attribution (Allocate.shapleyChannelAttribution):
    //    exact 3-channel Shapley over coalition conversion micro-rates —
    //    the efficient/symmetric credit split position rules violate.
    ("shapley_attribution",
      (spark, dir) =>
        Allocate.shapleyChannelAttribution(Tables.events(spark, dir)),
      Some {
        def phi6(solo: String, base: String, withA: String, aOnly: String,
                 withB: String, bOnly: String, full: String, rest: String) =
          s"2 * ($solo - $base) + ($withA - $aOnly) + ($withB - $bOnly) + 2 * ($full - $rest)"
        s"""WITH u AS (SELECT user_id,
           |                  MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
           |                  MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
           |                  MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS hs,
           |                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cv
           |           FROM events GROUP BY 1),
           |s AS (SELECT hv, hc, hs, CAST(COUNT(*) AS BIGINT) AS n,
           |             CAST(SUM(cv) AS BIGINT) AS k
           |      FROM u GROUP BY 1, 2, 3),
           |r AS (SELECT hv, hc, hs, (k * 2000000 + n) // (2 * n) AS r FROM s),
           |p AS (SELECT
           |  COALESCE(MAX(CASE WHEN hv=0 AND hc=0 AND hs=0 THEN r END), 0) AS r000,
           |  COALESCE(MAX(CASE WHEN hv=1 AND hc=0 AND hs=0 THEN r END), 0) AS r100,
           |  COALESCE(MAX(CASE WHEN hv=0 AND hc=1 AND hs=0 THEN r END), 0) AS r010,
           |  COALESCE(MAX(CASE WHEN hv=0 AND hc=0 AND hs=1 THEN r END), 0) AS r001,
           |  COALESCE(MAX(CASE WHEN hv=1 AND hc=1 AND hs=0 THEN r END), 0) AS r110,
           |  COALESCE(MAX(CASE WHEN hv=1 AND hc=0 AND hs=1 THEN r END), 0) AS r101,
           |  COALESCE(MAX(CASE WHEN hv=0 AND hc=1 AND hs=1 THEN r END), 0) AS r011,
           |  COALESCE(MAX(CASE WHEN hv=1 AND hc=1 AND hs=1 THEN r END), 0) AS r111
           |  FROM r),
           |ch AS (
           |  SELECT 'view' AS channel,
           |         CAST(${phi6("r100", "r000", "r110", "r010", "r101", "r001", "r111", "r011")} AS BIGINT) AS phi_micro6 FROM p
           |  UNION ALL
           |  SELECT 'click',
           |         CAST(${phi6("r010", "r000", "r110", "r100", "r011", "r001", "r111", "r101")} AS BIGINT) FROM p
           |  UNION ALL
           |  SELECT 'signup',
           |         CAST(${phi6("r001", "r000", "r101", "r100", "r011", "r010", "r111", "r110")} AS BIGINT) FROM p)
           |SELECT channel, phi_micro6,
           |       round(CAST(phi_micro6 AS DOUBLE) / 6000000.0, 6) AS phi
           |FROM ch ORDER BY channel""".stripMargin
      }),

    // ── Population stability index (Stats.psiDrift) of the order-value
    //    distribution, ≤1996 vs ≥1999, over 10 exact integer bins of the
    //    pooled range — micro-nat terms, one-sided bins excluded and
    //    reported.
    ("psi_price_drift",
      (spark, dir) =>
        Stats.psiDrift(Tables.orders(spark, dir),
          Scalars.moneyCents(col("o_totalprice")),
          col("o_orderdate") < lit("1997-01-01").cast("date"),
          col("o_orderdate") >= lit("1999-01-01").cast("date")),
      Some("""WITH base AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             |                     CASE WHEN o_orderdate < DATE '1997-01-01' THEN 1 ELSE 0 END AS a,
             |                     CASE WHEN o_orderdate >= DATE '1999-01-01' THEN 1 ELSE 0 END AS b
             |              FROM orders
             |              WHERE o_orderdate < DATE '1997-01-01'
             |                 OR o_orderdate >= DATE '1999-01-01'),
             |bounds AS (SELECT CAST(MIN(c) AS BIGINT) AS lo, CAST(MAX(c) AS BIGINT) AS hi FROM base),
             |grid AS (SELECT ((c - lo) * 10) // (hi - lo + 1) AS bin,
             |                CAST(SUM(a) AS BIGINT) AS ca, CAST(SUM(b) AS BIGINT) AS cb
             |         FROM base CROSS JOIN bounds GROUP BY 1),
             |g AS (SELECT *, CAST(SUM(ca) OVER () AS BIGINT) AS na,
             |             CAST(SUM(cb) OVER () AS BIGINT) AS nb
             |      FROM grid),
             |t AS (SELECT na, nb,
             |             CASE WHEN ca > 0 AND cb > 0 THEN
             |               CAST(round((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
             |                           - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
             |                          * ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
             |                               / (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)))
             |                          * 1e6) AS BIGINT) END AS term
             |      FROM g)
             |SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
             |       CAST(SUM(CASE WHEN term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bins_used,
             |       CAST(SUM(CASE WHEN term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bins_skipped,
             |       CAST(COALESCE(SUM(term), 0) AS BIGINT) AS psi_micronats,
             |       round(CAST(COALESCE(SUM(term), 0) AS BIGINT) / 1e6, 6) AS psi
             |FROM t""".stripMargin)),

    // ── Qini uplift deciles (Stats.qiniUpliftDeciles): cumulative
    //    incremental conversions of the hash-split arms by pre-period
    //    spend decile — the uplift eval, run here as an A/A flatness
    //    check. Exact rank deciles, never ntile.
    ("qini_uplift_deciles",
      (spark, dir) => Stats.qiniUpliftDeciles(Tables.orders(spark, dir)),
      Some(s"""WITH per AS (
              |  SELECT o_custkey,
              |         CAST(SUM(CASE WHEN o_orderdate < DATE '1996-01-01'
              |                       THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
              |         CAST(MAX(CASE WHEN o_orderdate >= DATE '1996-01-01'
              |                        AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS cv,
              |         ${sqlHashBucket("o_custkey", 2)} AS arm
              |  FROM orders GROUP BY 1),
              |rk AS (SELECT *, CAST(row_number() OVER (ORDER BY x DESC, o_custkey) AS BIGINT) AS rn,
              |              CAST(COUNT(*) OVER () AS BIGINT) AS n
              |       FROM per),
              |d AS (SELECT ((rn - 1) * 10) // n AS decile, arm, cv FROM rk),
              |byd AS (SELECT decile,
              |               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
              |               CAST(SUM(CASE WHEN arm = 1 THEN cv ELSE 0 END) AS BIGINT) AS tc,
              |               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cn,
              |               CAST(SUM(CASE WHEN arm = 0 THEN cv ELSE 0 END) AS BIGINT) AS cc
              |        FROM d GROUP BY 1),
              |cum AS (SELECT *,
              |        CAST(SUM(tn) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ctn,
              |        CAST(SUM(tc) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ctc,
              |        CAST(SUM(cn) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ccn,
              |        CAST(SUM(cc) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ccc
              |        FROM byd)
              |SELECT decile, tn, tc, cn, cc,
              |       CASE WHEN ctn > 0 AND ccn > 0 THEN
              |         round(CAST(ctc AS DOUBLE) / CAST(ctn AS DOUBLE)
              |               - CAST(ccc AS DOUBLE) / CAST(ccn AS DOUBLE), 6) END AS uplift_cum,
              |       CASE WHEN ctn > 0 AND ccn > 0 THEN
              |         round(CAST(ctc AS DOUBLE) - CAST(ccc AS DOUBLE)
              |               * (CAST(ctn AS DOUBLE) / CAST(ccn AS DOUBLE)), 6) END AS qini_cum
              |FROM cum ORDER BY decile""".stripMargin)),

    // ── Good–Turing singleton-mass / smoothed-count table
    //    (TextAnalysis.goodTuringMass): the unseen-probability estimator
    //    behind vocabulary-coverage planning, exact count-of-counts with
    //    half-up integer r* and mirrored per-level mass.
    ("good_turing_mass",
      (spark, dir) => TextAnalysis.goodTuringMass(Tables.documents(spark, dir)),
      Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
             |counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c
             |           FROM tok WHERE length(token) > 0 GROUP BY 1),
             |fof AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r FROM counts GROUP BY 1),
             |t AS (SELECT *, CAST(SUM(r * n_r) OVER () AS BIGINT) AS n_tokens,
             |             CAST(SUM(n_r) OVER () AS BIGINT) AS vocab
             |      FROM fof),
             |t2 AS (SELECT *, CAST(row_number() OVER (ORDER BY r) AS BIGINT) AS lvl FROM t),
             |j AS (SELECT t2.r, t2.n_r, CAST(COALESCE(f.n_r, 0) AS BIGINT) AS n_next,
             |             t2.n_tokens, t2.vocab
             |      FROM t2 LEFT JOIN fof f ON f.r = t2.r + 1
             |      WHERE t2.lvl <= 8)
             |SELECT r, n_r, n_next, n_tokens, vocab,
             |       ((r + 1) * n_next * 2000000 + n_r) // (2 * n_r) AS r_star_micro,
             |       CAST(round(CAST(r * n_r AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1e6) AS BIGINT) AS mass_micro
             |FROM j ORDER BY r""".stripMargin)),

    // ── Fellegi–Sunter probabilistic linkage audit
    //    (Dedup.fellegiSunterLinkage) over SymSpell-blocked dirty→clean
    //    customer candidates: integer micro-nat m/u weights (injected into
    //    both engines), three-band decisions, per-band precision audit.
    //    custkey%7 rows carry a STALE segment — the graceful-degradation
    //    case the weight model must absorb.
    ("fs_linkage_audit",
      (spark, dir) => {
        val cust = Tables.spread(Tables.customer(spark, dir), col("c_custkey"))
        val len = length(col("c_name"))
        val p = (col("c_custkey") % len.cast("long")).cast("int") + lit(1)
        val dirty = cust.select(
          col("c_custkey").as("dirty_id"), col("c_custkey").as("source_id"),
          concat(col("c_name").substr(lit(1), p - 1),
                 col("c_name").substr(p + 1, len - p)).as("dirty_name"),
          col("c_nationkey").as("d_nation"),
          when(col("c_custkey") % 7 === 0, lit("STALE"))
            .otherwise(col("c_mktsegment")).as("d_segment"))
        val clean = cust.select(col("c_custkey").as("clean_id"),
          col("c_name").as("clean_name"), col("c_nationkey").as("c_nation"),
          col("c_mktsegment").as("c_segment"))
        Dedup.fellegiSunterLinkage(dirty, clean)
      },
      Some {
        val Seq((wNa, wNd), (wTa, wTd), (wSa, wSd)) = Dedup.fsWeights
        def variantsCte(src: String, idCol: String, nameCol: String) =
          s"""SELECT $idCol, $nameCol,
             |              unnest(list_transform(range(0, length($nameCol) + 1),
             |                i -> CASE WHEN i = 0 THEN $nameCol
             |                          ELSE substring($nameCol, 1, CAST(i - 1 AS INT)) ||
             |                               substring($nameCol, CAST(i + 1 AS INT),
             |                                         length($nameCol) - CAST(i AS INT)) END)) AS key
             |       FROM $src""".stripMargin
        s"""WITH clean AS (SELECT c_custkey AS clean_id, c_name AS clean_name,
           |                      c_nationkey AS c_nation, c_mktsegment AS c_segment
           |               FROM customer),
           |dirty AS (SELECT c_custkey AS dirty_id, c_custkey AS source_id,
           |                 substring(c_name, 1, CAST(c_custkey % length(c_name) AS INT)) ||
           |                 substring(c_name, CAST(c_custkey % length(c_name) AS INT) + 2,
           |                           length(c_name) - CAST(c_custkey % length(c_name) AS INT) - 1) AS dirty_name,
           |                 c_nationkey AS d_nation,
           |                 CASE WHEN c_custkey % 7 = 0 THEN 'STALE' ELSE c_mktsegment END AS d_segment
           |          FROM customer),
           |dv AS (${variantsCte("dirty", "dirty_id", "dirty_name")}),
           |cv AS (${variantsCte("clean", "clean_id", "clean_name")}),
           |cand0 AS (SELECT DISTINCT dirty_id AS d_id, clean_id AS c_id
           |          FROM dv JOIN cv USING (key)),
           |cand AS (SELECT cand0.d_id, cand0.c_id, d.source_id, d.dirty_name,
           |                d.d_nation, d.d_segment, c.clean_name, c.c_nation, c.c_segment
           |         FROM cand0
           |         JOIN dirty d ON cand0.d_id = d.dirty_id
           |         JOIN clean c ON cand0.c_id = c.clean_id),
           |s AS (SELECT *,
           |        CAST(CASE WHEN levenshtein(dirty_name, clean_name) <= 1 THEN $wNa ELSE $wNd END
           |             + CASE WHEN d_nation = c_nation THEN $wTa ELSE $wTd END
           |             + CASE WHEN d_segment = c_segment THEN $wSa ELSE $wSd END AS BIGINT) AS score
           |      FROM cand),
           |d2 AS (SELECT *, CASE WHEN score >= 8000000 THEN 'match'
           |                      WHEN score >= 0 THEN 'possible'
           |                      ELSE 'non_match' END AS decision
           |       FROM s)
           |SELECT decision, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |       CAST(SUM(CASE WHEN c_id = source_id THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pairs,
           |       CAST(MIN(score) AS BIGINT) AS min_score_micro,
           |       CAST(MAX(score) AS BIGINT) AS max_score_micro
           |FROM d2 GROUP BY 1 ORDER BY decision""".stripMargin
      }),

    // ── ABC/Pareto part classification (Stats.abcPartClasses): the
    //    80/15/5 revenue split with integer cross-multiplied class cuts,
    //    rank window over the dimension-bounded part relation.
    ("abc_part_classes",
      (spark, dir) => Stats.abcPartClasses(Tables.lineitem(spark, dir)),
      Some("""WITH pp AS (SELECT l_partkey,
             |                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
             |            FROM lineitem GROUP BY 1),
             |c AS (SELECT *,
             |             CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             |             CAST(SUM(rev) OVER () AS BIGINT) AS total
             |      FROM pp),
             |k AS (SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
             |                  WHEN cum * 20 <= total * 19 THEN 'B'
             |                  ELSE 'C' END AS cls, rev, total
             |      FROM c)
             |SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
             |       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
             |       round(CAST(SUM(rev) AS DOUBLE) / CAST(MAX(total) AS DOUBLE), 6) AS revenue_share
             |FROM k GROUP BY 1 ORDER BY cls""".stripMargin)),

    // ── Split conformal coverage (Stats.conformalBacktestCoverage) of the
    //    seasonal-naive forecaster: parity-split residuals, exact-rank
    //    conformal quantile at 90%, test-half coverage — the honest
    //    prediction-band check.
    ("conformal_coverage",
      (spark, dir) =>
        Stats.conformalBacktestCoverage(Tables.orders(spark, dir)),
      Some(s"""WITH d AS ($sqlDailyRevenue),
              |s AS (SELECT day, rev_cents, lag(rev_cents, 7) OVER (ORDER BY day) AS pred FROM d),
              |sc AS (SELECT day, abs(rev_cents - pred) AS ae,
              |              CAST(date_diff('day', DATE '1970-01-01', day) % 2 AS BIGINT) AS par
              |       FROM s WHERE pred IS NOT NULL),
              |cal AS (SELECT ae, CAST(row_number() OVER (ORDER BY ae) AS BIGINT) AS rn,
              |               CAST(COUNT(*) OVER () AS BIGINT) AS nc
              |        FROM sc WHERE par = 0),
              |q AS (SELECT 1 AS k, CAST(MAX(nc) AS BIGINT) AS n_cal,
              |             CAST(MIN(CASE WHEN rn = ((nc + 1) * 90 + 99) // 100 THEN ae END) AS BIGINT) AS q_cents
              |      FROM cal),
              |t AS (SELECT 1 AS k, ae FROM sc WHERE par = 1)
              |SELECT n_cal,
              |       CAST(COUNT(t.ae) AS BIGINT) AS n_test, q_cents,
              |       CAST(SUM(CASE WHEN t.ae IS NOT NULL AND (q_cents IS NULL OR t.ae <= q_cents)
              |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
              |       CASE WHEN COUNT(t.ae) > 0 THEN
              |         round(CAST(SUM(CASE WHEN t.ae IS NOT NULL AND (q_cents IS NULL OR t.ae <= q_cents)
              |                             THEN 1 ELSE 0 END) AS DOUBLE)
              |               / CAST(COUNT(t.ae) AS DOUBLE), 6) END AS coverage,
              |       CAST(0.9 AS DOUBLE) AS target
              |FROM q LEFT JOIN t USING (k)
              |GROUP BY n_cal, q_cents""".stripMargin)),

    // ── Difference-in-differences (Stats.didEstimate): pre/post × arm
    //    2×2 on the hash experiment — the parallel-trends estimator, and
    //    on a null split the A/A placebo. One customer-grain aggregate.
    ("did_estimate",
      (spark, dir) => Stats.didEstimate(Tables.orders(spark, dir)),
      Some(s"""WITH per AS (
              |  SELECT o_custkey,
              |         CAST(SUM(CASE WHEN o_orderdate < DATE '1996-01-01'
              |                       THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
              |         CAST(SUM(CASE WHEN o_orderdate >= DATE '1996-01-01'
              |                       THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
              |         ${sqlHashBucket("o_custkey", 2)} AS arm
              |  FROM orders GROUP BY 1),
              |a AS (SELECT
              |  CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
              |  CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
              |  CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_t,
              |  CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_t,
              |  CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_c,
              |  CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_c
              |  FROM per)
              |SELECT n_treat, n_ctrl,
              |       CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
              |         round(CAST(sy_t AS DOUBLE) / CAST(n_treat AS DOUBLE)
              |               - CAST(sx_t AS DOUBLE) / CAST(n_treat AS DOUBLE), 6) END AS delta_treat,
              |       CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
              |         round(CAST(sy_c AS DOUBLE) / CAST(n_ctrl AS DOUBLE)
              |               - CAST(sx_c AS DOUBLE) / CAST(n_ctrl AS DOUBLE), 6) END AS delta_ctrl,
              |       CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
              |         round((CAST(sy_t AS DOUBLE) / CAST(n_treat AS DOUBLE)
              |                - CAST(sx_t AS DOUBLE) / CAST(n_treat AS DOUBLE))
              |               - (CAST(sy_c AS DOUBLE) / CAST(n_ctrl AS DOUBLE)
              |                  - CAST(sx_c AS DOUBLE) / CAST(n_ctrl AS DOUBLE)), 6) END AS did_cents
              |FROM a""".stripMargin)),

    // ── Chao1 vocabulary richness (TextAnalysis.chao1VocabEstimate):
    //    unseen-TYPES companion to good_turing_mass — Ŝ = S + n₁²/2n₂
    //    plus the bias-corrected form, from one token aggregate.
    ("chao1_vocab_estimate",
      (spark, dir) =>
        TextAnalysis.chao1VocabEstimate(Tables.documents(spark, dir)),
      Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
             |counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c
             |           FROM tok WHERE length(token) > 0 GROUP BY 1)
             |SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
             |       CAST(SUM(c) AS BIGINT) AS n_tokens,
             |       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |       CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |       CASE WHEN SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) > 0 THEN
             |         round(COUNT(*) + CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |                          * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |               / (CAST(2 AS DOUBLE)
             |                  * CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS DOUBLE)), 6)
             |       END AS chao1,
             |       round(COUNT(*) + CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |                        * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1 AS DOUBLE)
             |             / (CAST(2 AS DOUBLE)
             |                * CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1 AS DOUBLE)), 6) AS chao1_bc
             |FROM counts""".stripMargin))
  )
}
