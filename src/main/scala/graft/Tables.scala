package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet test tables (TESTDATA.md).
  *
  * All tables load as plain parquet scans so Catalyst keeps full pushdown /
  * pruning freedom. The one normalization: `events.ts` is written as parquet
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects
  * ([PARQUET_TYPE_ILLEGAL]). We read it as nanosecond longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microsecond
  * TimestampType — the same truncation DuckDB applies when it reads the file,
  * so oracle comparisons agree to the microsecond.
  */
object Tables {
  val relational: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  // One resolved relation per (session, dir, table), like any metastore or
  // long-lived application would hold: re-building the DataFrame per query
  // re-lists the path and re-decodes parquet footers every time — pure
  // fixed cost × queries × tables. The cached object is the *analyzed
  // logical relation only*; every query still plans, prunes, and pushes
  // filters against it independently (nothing is materialized).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

  /** Range-partition `df` on `keys` to default parallelism — but ONLY when
    * it currently has fewer partitions than cores (at test SF the parquet
    * files are single-row-group, so scans arrive as ONE task; on a cluster
    * a large scan has far more splits than cores and this is a no-op).
    *
    * Why range, not round-robin: RangePartitioning on k satisfies both the
    * clustered distribution of a downstream per-k aggregate/window and the
    * ordered distribution of a k-sorted output, so the one rescue exchange
    * replaces the aggregation exchange AND the presentation sort's range
    * exchange (its bound sampling included). The guard is what keeps this
    * scale-honest: when the scan is already parallel, a pre-aggregation
    * shuffle of raw rows would cost more than the partial-agg hash shuffle
    * it displaces, so the plan reverts to the classic
    * partial→exchange→final shape. Measured at sf0.1:
    * dedup_lineitem 0.86 → 0.48 s, latest_event_per_user 0.50 → 0.25 s,
    * minhash_signatures 0.64 → 0.31 s.
    *
    * Only worth it when the spread ELIDES at least one additional exchange
    * (an aggregate/window between it and the sort) or feeds genuinely
    * CPU-heavy per-row work: on map-only sort-terminated queries the sort's
    * range exchange already does everything this would, and the added
    * partition-count probe + sampling made batch_extract 0.26 → 0.33 s
    * (measured, reverted).
    *
    * PRECONDITION (enforced): the input must be scan-rooted — scans plus
    * per-row ops (filter/project/generate) only. The partition-count probe
    * reads `df.rdd`, which forces physical planning and, under AQE, would
    * eagerly MATERIALIZE any shuffle stage in the input (real jobs fired
    * from inside what looks like plan construction). Rather than trust
    * call-site discipline, the guard walks the logical plan: any
    * shuffle-inducing node (aggregate, join, window, sort, repartition, …)
    * skips the probe and returns the input unchanged — such a plan already
    * has an exchange to parallelize it, so the rescue has nothing to fix.
    */
  def spread(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    if (!scanRooted(df)) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartitionByRange(cores, keys: _*)
    else df
  }

  /** True iff the analyzed plan is scans + per-row operators only (no node
    * that could plan an exchange — so probing `.rdd` cannot run jobs).
    */
  private def scanRooted(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.analyzed.collectFirst {
      case n if !(n.isInstanceOf[LeafNode] || n.isInstanceOf[Project] ||
                  n.isInstanceOf[Filter] || n.isInstanceOf[SubqueryAlias] ||
                  n.isInstanceOf[Generate]) => n
    }.isEmpty
  }

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` with `ts` still the raw nanosecond long — the column filters
    * can push to the parquet scan (row-group min/max skipping).
    *
    * Read with an explicit schema (ts as BIGINT): schema *inference* on a
    * TIMESTAMP(NANOS) column requires the global
    * `spark.sql.legacy.parquet.nanosAsLong` conf, but a user-supplied
    * LongType for the INT64 physical column reads fine without it — so the
    * loader no longer mutates session state (a conf set inside a reader is
    * a global side effect on the caller's session). The schema doubles as
    * the pinned contract for this table (TESTDATA.md).
    */
  private val eventsSchema =
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"

  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    cache.computeIfAbsent((spark, dir, "events#raw"),
      _ => spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet"))

  private def nanosToTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** `events` with `ts` normalized from parquet TIMESTAMP(NANOS) to
    * microsecond TimestampType. Integer division (never double math — ns
    * magnitudes exceed 2^53) keeps the truncation exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    nanosToTs(eventsRaw(spark, dir))

  /** Pushdown-friendly incremental scan (SURVEY §2.9 T1): the watermark is
    * applied to the *raw* nanosecond column, so it reaches the parquet
    * reader as `GreaterThan(ts, …)` — a predicate on the derived
    * `timestamp_micros(ts DIV 1000)` column stays a post-scan DataFilter and
    * reads every row group at 100 TB. `ns > 1000·W_µs + 999` is exactly
    * `trunc(ns/1000) > W_µs`, so results match the derived-column filter.
    */
  def eventsSinceMicros(spark: SparkSession, dir: String, watermarkMicros: Long): DataFrame =
    nanosToTs(eventsRaw(spark, dir)
      .filter(col("ts") > lit(watermarkMicros * 1000L + 999L)))
}
