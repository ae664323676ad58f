package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fluent MERGE over plain parquet-backed DataFrames — the engine's face for
  * the reference's `INSERT OR REPLACE` upserts (db.py:229-236,272-279) and
  * conditional flag updates (db.py:325-440), without a transactional table
  * format:
  *
  * {{{
  * Merge.into(state).using(batch).on("replay_id")
  *   .whenMatchedUpdate("is_downloaded" -> lit(true))
  *   .whenNotMatchedInsert()
  *   .orderUpdatesBy(col("ts").desc, col("event_id").desc)
  *   .run()
  * }}}
  *
  * Semantics: one deterministic pass —
  *  - matched target rows get the update expressions applied (arbitrary
  *    `Column`s over target + `src_`-prefixed source columns);
  *  - unmatched source rows are inserted as-is (when enabled);
  *  - multiple source rows per key are reduced to one by the
  *    `orderUpdatesBy` total order *before* matching, so the merge is
  *    last-write-wins and replay-idempotent (the contract T4 needs).
  *
  * Scale: a single equi-join on the key (co-partitioned if the state table
  * is bucketed on it) plus one ranking window over the source — no
  * per-row point updates.
  */
object Merge {
  def into(target: DataFrame): MergeBuilder =
    MergeBuilder(target, null, Seq.empty, Map.empty, insert = false, Seq.empty)
}

case class MergeBuilder(target: DataFrame, source: DataFrame, keys: Seq[String],
                        updates: Map[String, Column], insert: Boolean,
                        updateOrder: Seq[Column]) {
  def using(src: DataFrame): MergeBuilder = copy(source = src)
  def on(keyCols: String*): MergeBuilder = copy(keys = keyCols)
  def whenMatchedUpdate(cols: (String, Column)*): MergeBuilder =
    copy(updates = updates ++ cols)
  def whenNotMatchedInsert(): MergeBuilder = copy(insert = true)
  /** Total order picking the winning source row per key (first wins). */
  def orderUpdatesBy(order: Column*): MergeBuilder = copy(updateOrder = order)

  def run(): DataFrame = {
    require(source != null, "Merge needs .using(source)")
    require(keys.nonEmpty, "Merge needs .on(keys)")
    val src0 =
      if (updateOrder.isEmpty) {
        // no reduction order given: duplicate source keys would silently
        // multiply matched target rows — fail fast like a transactional
        // MERGE's "multiple source rows matched" error
        val dup = source.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
        require(dup == 0,
          "Merge source has multiple rows per key; add .orderUpdatesBy(...) to pick a winner")
        source
      } else {
        val w = Window.partitionBy(keys.map(col): _*).orderBy(updateOrder: _*)
        source.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    // prefix non-key source columns so update expressions can reference both
    val src = src0.columns.foldLeft(src0) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, s"src_$c")
    }.withColumn("__matched", lit(true))
    val joined = target.join(src, keys, "left_outer")
    val updatedTarget = updates.foldLeft(joined) { case (df, (name, expr)) =>
      df.withColumn(name,
        when(coalesce(col("__matched"), lit(false)), expr).otherwise(col(name)))
    }.select(target.columns.toIndexedSeq.map(col): _*)
    if (!insert) updatedTarget
    else {
      val inserts = src0.join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")
      val aligned = target.columns.foldLeft(inserts) { (df, c) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
      }.select(target.columns.toIndexedSeq.map(col): _*)
      updatedTarget.unionByName(aligned)
    }
  }
}
