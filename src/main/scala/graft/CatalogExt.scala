package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data-pipeline extension catalog: deduplication, similarity
  * search, text analysis, multimodal metadata (SURVEY.md §7.2 step 7 + the
  * builder mandate). Hash-based operators use md5 (canonical hex on both
  * engines); floating-point outputs are rounded to 6 decimals after exact or
  * near-exact arithmetic.
  *
  * Round 13: the single 5.7k-line file is split into three chunk objects
  * ([[CatalogDedupSim]], [[CatalogCurationStats]], [[CatalogStatsExt]]) with
  * the shared DuckDB twin-SQL fragments in [[CatalogExtShared]]; the
  * concatenation below preserves the original entry order exactly.
  */
object CatalogExt {

  type QueryFn = (SparkSession, String) => DataFrame

  val entries: Seq[(String, QueryFn, Option[String])] =
    CatalogDedupSim.entries ++ CatalogCurationStats.entries ++
      CatalogStatsExt.entries
}
