package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled",
              sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // re-measurement probes (SCALE.md "Measured config defaults"):
      // AQE coalesce floor + advisory target, overridable per run
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
              sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "1m"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
              sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
              sys.env.getOrElse("SPARK_GRAFT_PFIRST", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.arm(spark) // loud bounded-report truncation watcher
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JIT, codegen compiler, parquet footer/codec paths)
    // so the first timed query isn't charged for JVM startup costs.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1000).groupBy("l_returnflag").count().collect()
    Tables.events(spark, sfDir).limit(1000).count()
    // optional comma-separated subset for local iteration (full suite when unset)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val catalog = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // Floor mode (SPARK_GRAFT_BENCH_FLOOR=1): run the SAME harness loop over
    // one trivial single-task plan per catalog query. The resulting total is
    // the per-query session floor — scheduler + codegen + noop-commit cost
    // that every query pays regardless of its data work. BASELINE.md cites
    // this measurement when interpreting the vs_baseline ratio at tiny SF.
    val selected =
      if (sys.env.contains("SPARK_GRAFT_BENCH_FLOOR"))
        catalog.map { case (n, _) =>
          n -> ((s: SparkSession, _: String) => s.range(1).toDF("id"))
        }
      else catalog
    // returns per-query (seconds, succeeded)
    def once(qs: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]
             = selected): Map[String, (Double, Boolean)] = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: every output column is fully computed (count() would let
      // Catalyst prune projection-only queries to a bare scan), no I/O cost.
      val ok =
        try {
          Tuning.withTuned(spark, name) {
            fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          }; true
        } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      // isolate queries from each other: drop caches / localCheckpoint
      // blocks a query may have left behind (iterative ops checkpoint), so
      // later timings don't pay earlier queries' storage + GC pressure
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      name -> ((dt, ok))
    }
    // three passes, per-query minimum over *successful* runs: suppresses
    // transient host noise without letting a fast failure masquerade as the
    // best time; a query that fails every pass reports -1. Three, not two:
    // the suite takes minutes end to end, and the bench host shows
    // multi-minute degradation windows — a stall that covers the same query
    // in two consecutive passes sticks in a 2-pass min (observed:
    // retry_queue 0.56 s in a clean run, 3.1 s in both passes of a degraded
    // one). The DuckDB comparator is measured with the same 3-pass-min
    // protocol (tools/pin_baseline.py).
    // Host-speed probe (see "Host-speed calibration" below): a fixed
    // deterministic job timed around each pass, so the factor reflects the
    // same wall-clock window the suite actually ran in. Blended profile —
    // an ALU loop plus a full-width parquet scan-and-hash — because the
    // host's slowdown windows have hit memory/decompression bandwidth
    // without showing in a pure-ALU probe.
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 2000000000L, 1L, 32).selectExpr("bit_xor(xxhash64(id))").collect()
      Tables.lineitem(spark, sfDir).selectExpr("bit_xor(hash(*))").collect()
      Tables.eventsRaw(spark, sfDir).selectExpr("bit_xor(hash(*))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    calibOnce() // JIT warm, untimed
    val calibs = scala.collection.mutable.ArrayBuffer[Double]()
    val passes = Seq.fill(3) { calibs += calibOnce(); once() }
    calibs += calibOnce()
    val multiPass = selected.keys.map { k =>
      val ok = passes.map(_(k)).filter(_._2).map(_._1)
      k -> (if (ok.isEmpty) -1.0 else ok.min)
    }.toMap
    // Selective extra pass: when a query's best and worst still disagree
    // badly, a stall may cover all three — one targeted retry pins it.
    val noisy = selected.keySet.filter { k =>
      val ts = passes.map(_(k)).filter(_._2).map(_._1)
      ts.nonEmpty && ts.max > 1.5 * ts.min && ts.max > 1.0
    }
    val p4 = if (noisy.nonEmpty) once(selected.view.filterKeys(noisy).toMap) else Map.empty[String, (Double, Boolean)]
    val results = multiPass.map { case (k, best) =>
      k -> (p4.get(k) match {
        case Some((t4, true)) if best >= 0 => math.min(best, t4)
        case _ => best
      })
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // The DuckDB comparator covers exactly the oracle'd queries; catalog
    // entries without an oracle would have no denominator, so the headline
    // ratio is computed over the comparable subset and the rest is itemized.
    // (As of round 5 every catalog entry carries an oracle — the partition
    // is kept so a future non-SQL-expressible op degrades gracefully.)
    val (comparable, noncomparable) = results.partition {
      case (k, _) => SparkEntry.oracleSql.contains(k)
    }
    val comparableSec = comparable.values.sum
    val noncompJson = noncomparable.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Work-asymmetric rows (BASELINE.md "Work asymmetry"): their oracles
    // verify the RESULT relationally while the Spark side does categorically
    // more work by design — compaction_roundtrip writes+rewrites+rereads a
    // partitioned dataset where the twin runs one aggregate;
    // stream_daily_parity boots a real micro-batch streaming execution
    // where the twin is the batch aggregate. They stay in the primary
    // ratio (they ARE catalog queries); vs_baseline_symmetric is the
    // like-for-like diagnostic over the rows where both engines execute
    // comparable plans.
    val asymmetric = Set("compaction_roundtrip", "glob_directory_scan", "stream_daily_parity",
      "json_replay_roundtrip",
      // real throttled micro-batch execution (3 triggers + checkpoint dir)
      // vs a pure range() arithmetic twin
      "throttled_stream_stats",
      // real watermarked-dedup micro-batch execution vs a batch DISTINCT
      "stream_dedup_parity",
      // real flatMapGroupsWithState three-trigger execution vs closed-form
      // CASE arithmetic
      "stream_retry_parity",
      // real two-data-trigger stream-stream interval-join execution (join
      // state retained across micro-batches, plus the closing
      // watermark-advance batch) vs a batch range-join twin
      "stream_context_parity",
      // real two-trigger session-window execution (sentinel watermark
      // closure) vs a batch gaps-and-islands twin
      "stream_session_parity",
      // bucketed-table staging writes on first invocation; the twin never
      // writes (steady-state reads are symmetric, the 3-pass min usually
      // lands there, but the stage can be charged to pass 1 in a cold run)
      "bucketed_join_counts")
    val symmetricSec = comparable.collect {
      case (k, v) if !asymmetric.contains(k) => v
    }.sum
    val asymSec = comparableSec - symmetricSec
    // Pinned comparator (BASELINE.md "Measured comparator"): the DuckDB
    // oracle-suite total on the identical sf0.1 parquet, 32 threads,
    // 3-pass per-query min. Override via env when re-measuring. The pin and
    // calib_quiet below are measured in the SAME probe-bracketed window
    // (BASELINE.md round-4 re-pin) so the host-factor correction is
    // coherent: a bench run in a slower window scales the bar to what
    // DuckDB would have measured there.
    // 75.67 = the round-12 measured 218-query pin (BASELINE.md "Round-12
    // quiet-window re-pin": median of 5 process runs 75.7/76.8/78.2/
    // 74.4/75.1 — range ≤1.05×, no degraded pass — in one probe-bracketed
    // window, opens 0.823/0.873 and CLOSE 0.788 on the CalibProbe scale,
    // i.e. the window held quiet through the pin; landed unattended by
    // tools/quiet_pin_loop.py). ZERO increment layers: every one of the
    // 218 twins was measured in this single window. Composition
    // cross-check: the round-10 205-query bar 76.8 (whose window closed
    // ~7% warm, flagged "may read ~5% high") corrected to quiet ≈73 plus
    // the 13 twins added since (solo ≈+2.9 s) composes to ≈75.9 — the
    // adopted median sits right on it. `baseline_per_query.json` carries
    // the same window. Lower bar than the 205-query 76.8 despite 13 more
    // rows because THIS window was genuinely quiet end to end — the
    // conservative direction (a lower bar only ever raises vs_baseline).
    // 75.8 = the round-13 COMPOSED 219-query bar: the measured round-12
    // 218-query pin 75.67 plus the one query added since
    // (ivf_incremental_assign, twin solo-timed 0.133 s median-of-5 at
    // round-13 close; 0.168 min-of-3 on landing — BASELINE.md "Round-13
    // increment"). Composed, not measured: the round-13 quiet-pin watcher
    // polled 23:25–03:18 without two qualifying quiet probes
    // (plans/r13/quiet_watch_r13.log), so the full 219-row re-pin is the
    // next quiet window's first task.
    val baselineQuiet = sys.env.getOrElse("SPARK_GRAFT_BASELINE_SEC", "75.8").toDouble
    // Host-speed calibration (BASELINE.md "Host-speed calibration"): the
    // shared build host has multi-minute windows where EVERYTHING runs
    // 20-85% slower (hypervisor-level; guest vmstat shows idle CPU while
    // the DuckDB comparator suite itself swings 17.3-32.0 s). The probes
    // above bracket each timed pass; the median factor vs the quiet-host
    // probe pin rescales the comparator to the window this run actually
    // got. Floor 1.0 (a fast window never shrinks the bar), cap 2.0
    // (bounds the mechanism; beyond that the run is junk — rerun it).
    // Every sample is emitted so the correction is fully auditable, and
    // vs_baseline_quiet carries the uncorrected ratio alongside.
    // Pin-choice sensitivity (audit note): calib_quiet is pinned from the
    // same probe-bracketed window as the baseline, and WHERE in that
    // window's probe range it lands scales the correction directly —
    // pinning at the window minimum maximizes host_factor in any slower
    // window, pinning at the median is conservative. The UNCORRECTED
    // vs_baseline_quiet in the JSON is therefore the primary gate number;
    // vs_baseline is the window-corrected diagnostic, ±(probe spread) in
    // sensitivity. 0.80 = the round-7 session-5 window-median pin,
    // re-confirmed by the round-8 re-pin's bracketing probes
    // (0.779–0.987, median ≈0.81 around the 49.4 s pin).
    val calibQuiet = sys.env.getOrElse("SPARK_GRAFT_CALIB_QUIET_SEC", "0.80").toDouble
    // min, not median: the per-query time is the MIN over the three
    // passes, which structurally gravitates to the fastest window the run
    // saw — so the factor must describe that same best window. Min is also
    // the conservative choice (smallest correction).
    val hostFactor = math.min(2.0, math.max(1.0, calibs.min / calibQuiet))
    val baselineSec = baselineQuiet * hostFactor
    val ratio = comparableSec / baselineSec
    // k-means job-chain floor itemization (SCALE.md "k-means job-chain
    // floor"; BASELINE.md): the hash-pinned quantizer algorithms are
    // SEQUENTIAL driver-blocking job chains — fused seed+query collect →
    // Lloyd round(s) → scored scan. JobAudit at sf0.1: ivf_recall 3 jobs,
    // ivf_assign 4, pq_ann_topk / pq_recall 5, ivf_ann_topk / pq_codes 6,
    // ivfpq_* 7 — with SINGLE-DIGIT task counts, so the wall time is the
    // per-job scheduler + per-plan analysis/codegen constant, not data
    // work. DuckDB's single-process CTE stack pays no such constant; at
    // cluster scale the same chains amortize over minutes-long stages.
    // Itemized so the gate reader can subtract the documented single-node
    // artifact; the PRIMARY ratio keeps carrying it.
    val jobChain = Set("ivf_assign", "ivf_ann_topk", "ivf_recall",
      "pq_codes", "pq_ann_topk", "pq_recall", "ivfpq_ann_topk", "ivfpq_recall",
      "kcenter_coreset",
      // same Lloyd chain plus the save→load parquet roundtrip by design
      "ivf_index_search", "ivf_incremental_assign",
      // round-12 formal floor acceptance (BASELINE.md "copurchase floor
      // decomposition"): driver-blocking collect chains by design —
      // copurchase_lift's brand-universe collect + one-job mask/tag chain
      // + LocalRelation projection, link_prediction's eager adjacency
      // checkpoint; measured decomposition puts their structural floor
      // (collect jobs + plan build) above 2x their sub-0.3 s DuckDB twins
      // at ANY further shape change tried (r10-r12 surgeries)
      "copurchase_lift", "copurchase_link_prediction")
    val jobChainSec = comparable.collect { case (k, v) if jobChain(k) => v }.sum
    // ivf_index_search decomposition (the jobchain itemization convention,
    // round-13 verdict item): the row's wall time is mostly the
    // train+save+load index file ops, not serving — time the two halves
    // once, diagnostically (NOT part of any ratio), so the gate reader can
    // see the file-ops tax explicitly. Same config as the catalog row.
    val ivfSplitJson =
      if (selected.contains("ivf_index_search") &&
          !sys.env.contains("SPARK_GRAFT_BENCH_FLOOR")) {
        try {
          import org.apache.spark.sql.functions.col
          val emb = Tables.embeddings(spark, sfDir)
          val corpus = emb.filter(col("vec_id") >= 8)
          val path = CatalogCore.scratchDir("graft_ivf_bench_")
          val t0 = System.nanoTime()
          ops.Similarity.saveIvfIndex(spark, path, corpus, 16, 1)
          val cents = ops.Similarity.loadIvfIndex(spark, path, 16, 1)
          val t1 = System.nanoTime()
          ops.Similarity.ivfTopKWithIndex(emb.filter(col("vec_id") < 8),
              corpus, k = 3, nProbe = 2, cents)
            .write.mode("overwrite").format("noop").save()
          val t2 = System.nanoTime()
          f""","ivf_index_search_split":{"train_save_load_sec":${(t1 - t0) / 1e9}%.3f,"serve_sec":${(t2 - t1) / 1e9}%.3f}"""
        } catch { case _: Throwable => "" }
      } else ""
    val calibJson = calibs.map(c => f"$c%.3f").mkString("[", ",", "]")
    // symmetric diagnostic: like-for-like rows over the baseline minus the
    // asymmetric rows' (trivial) DuckDB cost — conservatively approximated
    // as 0 there, which UNDERSTATES the symmetric denominator and so
    // overstates (never flatters) the symmetric ratio.
    val symRatioQuiet = symmetricSec / baselineQuiet
    val json = s"""{"metric":"total","value":$total,"unit":"sec","comparable_sec":$comparableSec,"symmetric_sec":$symmetricSec,"asymmetric_sec":$asymSec,"jobchain_floor_sec":$jobChainSec$ivfSplitJson,"noncomparable":$noncompJson,"baseline_sec":$baselineSec,"baseline_quiet_sec":$baselineQuiet,"calib_quiet_sec":$calibQuiet,"calib_secs":$calibJson,"host_factor":$hostFactor,"vs_baseline":$ratio,"vs_baseline_quiet":${comparableSec / baselineQuiet},"vs_baseline_symmetric_quiet":$symRatioQuiet,"queries":$qs,"sf":"$sfDir"}"""
    // stdout goes through sbt's logger ("[info] "-prefixed), which breaks
    // line-oriented JSON parsing downstream — also write the result to a file
    // (override path via SPARK_GRAFT_BENCH_OUT; default = cwd/bench_out.json).
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")),
      json + "\n")
    println(json)
    // The stream-parity queries exercise stateful streaming; its async
    // maintenance timer otherwise fires after SparkContext teardown and
    // dumps a "SparkEnv not active" stack trace as the process's LAST
    // output — which is exactly the log tail a harness keeps. Stop it first.
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    spark.stop()
    // Final headline line AFTER stop, so it is the last thing printed and —
    // unlike the full contract line above (~3 KB: 87 query timings) — short
    // enough to survive any last-N-chars log-tail truncation intact. Same
    // gate numbers; slowest-10 inline; full per-query map in the contract
    // line and in bench_out.json.
    val slowest = results.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","comparable_sec":$comparableSec%.3f,"baseline_sec":$baselineSec%.3f,"host_factor":$hostFactor%.4f,"vs_baseline":$ratio%.4f,"vs_baseline_quiet":${comparableSec / baselineQuiet}%.4f,"slowest10":$slowest,"queries_full":"bench_out.json","sf":"$sfDir"}""")
  }
}
