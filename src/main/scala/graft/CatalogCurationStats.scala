package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import CatalogExtShared._

/** Extension catalog, chunk 2: curriculum/DSIR curation, the composed dedup and curation pipelines, tokenizer prep, layout audits, event-path/retention/funnel windows, mergeable sketches (HLL, quantile, CMS, KMV, histogram, Bloom), graph ops (PageRank, triangles), and the first stats family rows through readability.
  * One of three positional chunks of the former single-file CatalogExt
  * (round 13 split): entry ORDER is preserved exactly — the concatenation
  * in [[CatalogExt.entries]] reproduces the original literal.
  */
private[graft] object CatalogCurationStats {

  val entries: Seq[(String, QueryFn, Option[String])] = Seq(
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

  )
}
