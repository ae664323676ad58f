package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A single versioned state-schema migration: `apply` transforms the state
  * relation from schema version `version - 1` to `version`.
  */
case class Migration(version: Long, description: String,
                     apply: DataFrame => DataFrame)

/** Versioned state-schema migration surface (reference: the `db_migration`
  * tracking table + `run_migrations()` loop, db.py:79-154 — check
  * `MAX(version)`, apply each pending migration in order, record it).
  *
  * Spark-first shape: the migration log is a tiny relation (version,
  * description, migrated_at) living next to the state table; the loop is a
  * driver-side fold over DataFrame transforms — schema evolution is plan
  * surgery, not row-at-a-time DML, so each migration is one distributed
  * rewrite no matter the state-table size. At 100 TB the log is broadcast-
  * scale metadata and each `apply` is a single scan→project job.
  */
object Migrations {

  /** Canonical empty migration log. */
  def emptyLog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, Long)].toDF("version", "description", "migrated_at")
  }

  /** O2 — the reference's `SELECT MAX(version)` with 0 for a fresh database
    * (db.py:100-103).
    */
  def currentVersion(log: DataFrame): Long =
    log.agg(coalesce(max(col("version")), lit(0L))).head().getLong(0)

  /** Apply every registry migration with `version > currentVersion(log)` in
    * ascending order; returns the migrated state and the appended log.
    * `migratedAtEpoch` is injected (the reference stamps wall-clock; a
    * deterministic engine takes the clock as an input). Idempotent: a second
    * run with the returned log is a no-op.
    */
  def migrate(state: DataFrame, log: DataFrame, registry: Seq[Migration],
              migratedAtEpoch: Long): (DataFrame, DataFrame) = {
    require(registry.map(_.version).distinct.size == registry.size,
      "duplicate migration versions in registry")
    val cur = currentVersion(log)
    val todo = registry.filter(_.version > cur).sortBy(_.version)
    todo.zipWithIndex.foreach { case (m, i) =>
      require(m.version == cur + i + 1,
        s"migration chain has a gap: expected version ${cur + i + 1}, found ${m.version}")
    }
    val newState = todo.foldLeft(state)((df, m) => m.apply(df))
    val spark = state.sparkSession
    import spark.implicits._
    val appended = log.unionByName(
      todo.map(m => (m.version, m.description, migratedAtEpoch))
        .toDF("version", "description", "migrated_at"))
    (newState, appended)
  }
}
