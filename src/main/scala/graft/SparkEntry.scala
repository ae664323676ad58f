package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in [[CatalogCore]] (SURVEY §2 reference-parity operators) and
  * [[CatalogExt]] (training-data-pipeline extensions). Each entry pairs a
  * Spark implementation with a DuckDB oracle; entries without an oracle are
  * approximate operators checked by rows-only + ScalaTest recall bounds.
  */
object SparkEntry {

  private val all = CatalogCore.entries ++ CatalogExt.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * daily lifecycle/compaction stats over the event stream.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("daily_lifecycle_stats")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, fn, _) => name -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (name, _, Some(sql)) => name -> sql }.toMap
}
