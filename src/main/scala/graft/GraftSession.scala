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

  /** Local session (tests, single-node runs). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder().master(s"local[$cores]").getOrCreate()
}
