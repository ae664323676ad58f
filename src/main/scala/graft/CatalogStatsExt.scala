package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import CatalogExtShared._

/** Extension catalog, chunk 3: the remaining stats/window/allocation families — containment pairs, drift and A/B testing, robust stats, survival and time-series rows, attribution, ANN quality curves, coreset/scatter audits, privacy audits, and probabilistic linkage through Chao1.
  * One of three positional chunks of the former single-file CatalogExt
  * (round 13 split): entry ORDER is preserved exactly — the concatenation
  * in [[CatalogExt.entries]] reproduces the original literal.
  */
private[graft] object CatalogStatsExt {

  val entries: Seq[(String, QueryFn, Option[String])] = Seq(
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
