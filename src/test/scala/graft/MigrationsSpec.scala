package graft

import graft.ops.{Migration, Migrations}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MigrationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registry = Seq(
    Migration(1L, "rename status -> is_downloaded",
      _.withColumnRenamed("status", "is_downloaded")),
    Migration(2L, "add is_compacted default false",
      _.withColumn("is_compacted", lit(false))))

  private def state0 = Seq(("r-1", true), ("r-2", false)).toDF("replay_id", "status")

  test("currentVersion of an empty log is 0") {
    assert(Migrations.currentVersion(Migrations.emptyLog(spark)) == 0L)
  }

  test("migrate applies pending migrations in order and records them") {
    val (state, log) =
      Migrations.migrate(state0, Migrations.emptyLog(spark), registry, 1700000000L)
    assert(state.columns.toSeq == Seq("replay_id", "is_downloaded", "is_compacted"))
    assert(state.count() == 2)
    val rows = log.orderBy("version")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(1L, 2L))
    assert(rows.forall(_._3 == 1700000000L))
    assert(Migrations.currentVersion(log) == 2L)
  }

  test("migrate is idempotent: a second run from the returned log is a no-op") {
    val (state1, log1) =
      Migrations.migrate(state0, Migrations.emptyLog(spark), registry, 1700000000L)
    val (state2, log2) = Migrations.migrate(state1, log1, registry, 1800000000L)
    assert(log2.count() == log1.count())
    assert(state2.columns.sameElements(state1.columns))
  }

  test("migrate picks up only versions above the log's current version") {
    val partial = Seq((1L, "rename status -> is_downloaded", 1600000000L))
      .toDF("version", "description", "migrated_at")
    // state already at v1 (column renamed)
    val stateV1 = state0.withColumnRenamed("status", "is_downloaded")
    val (state, log) = Migrations.migrate(stateV1, partial, registry, 1700000000L)
    assert(state.columns.contains("is_compacted"))
    assert(log.count() == 2)
    assert(log.filter($"migrated_at" === 1700000000L).count() == 1)
  }

  test("migrate rejects a gapped chain") {
    val gapped = Seq(Migration(2L, "skips v1", identity[org.apache.spark.sql.DataFrame] _))
    intercept[IllegalArgumentException] {
      Migrations.migrate(state0, Migrations.emptyLog(spark), gapped, 1700000000L)
    }
  }
}
