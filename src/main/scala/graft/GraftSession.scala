package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession pre-configured the way every
  * graft operator expects (and the way the oracle gate assumes).
  *
  *  - UTC session time zone — every epoch↔date conversion in the engine is
  *    tz-free; a local-zone session would silently shift day boundaries;
  *  - AQE on — runtime partition coalescing, skew-join splitting;
  *  - 32 shuffle partitions as the baseline (size to the cluster per
  *    deployment; never the 200 default for local/small-cluster runs);
  *  - [[GraftExtensions]] wired so `cosine_similarity(a, b)` is callable
  *    from SQL.
  *
  * `Bench`/`Verify` build through this too, so the driver-contract mains and
  * a user session can never drift apart.
  */
object GraftSession {

  /** The engine's standard configuration, exposed for audit/tests. */
  val conf: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.shuffle.partitions" -> "32",
    "spark.sql.extensions" -> "graft.GraftExtensions")

  /** Builder with the standard configuration applied; call-site `.config`
    * calls layered after this override individual keys.
    */
  def builder(): SparkSession.Builder =
    conf.foldLeft(SparkSession.builder()) { case (b, (k, v)) => b.config(k, v) }

  /** Local session (tests, single-node runs) — guard-armed. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    arm(builder().master(s"local[$cores]").getOrCreate())

  // ── bounded-report truncation guard ──────────────────────────────────
  // CatalogCore.orderedReport caps structurally-bounded reports with
  // limit(ReportBound); if a group structure ever outgrew the bound, rows
  // would silently truncate (and silently diverge from any SQL twin, which
  // has no LIMIT). Every orderedReport plan carries an observe() metric
  // counting result rows; armed sessions watch it and flag result == bound
  // — loud instead of silent, with no extra job or shuffle (CollectMetrics
  // is a pass-through accumulator node).

  private[graft] val BoundMetric = "graft_report_bound"
  private val lastTruncation =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** The most recent query whose bounded report hit ReportBound exactly
    * (truncation suspect), if any since the last [[clearBoundTruncation]].
    */
  def lastBoundTruncation: Option[String] = Option(lastTruncation.get)
  def clearBoundTruncation(): Unit = lastTruncation.set(null)

  private val armed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Register the truncation watcher on `spark` (idempotent). [[local]],
    * Bench, and Verify all arm their sessions; arm any long-lived
    * application session the same way.
    */
  def arm(spark: SparkSession): SparkSession = {
    if (armed.add(spark))
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit =
          qe.observedMetrics.get(BoundMetric).foreach { row =>
            if (row.getLong(0) >= CatalogCore.ReportBound) {
              val msg = s"bounded report hit ReportBound=${CatalogCore.ReportBound} " +
                "rows — output is almost certainly TRUNCATED (group structure " +
                "outgrew the bound); raise ReportBound or drop orderedReport " +
                "for this query"
              lastTruncation.set(msg)
              System.err.println(s"[graft] ERROR: $msg")
            }
          }
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      })
    spark
  }
}
