package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout optimization: space-filling-curve (Z-order) clustering,
  * the technique behind `OPTIMIZE ZORDER BY` in lakehouse table formats.
  * Sorting on the interleaved Morton code co-locates rows that are close in
  * EVERY keyed dimension, so per-file min/max statistics prune scans for
  * predicates on any of the keys — the multi-dimensional analogue of the
  * single-column sort the compaction path already applies. All bit
  * arithmetic is exact BIGINT, identical on any engine.
  */
object Layout {

  /** Spread the low 16 bits of `x` to the even bit positions of a 32-bit
    * lane (Morton/Z-curve bit spreading via the standard mask ladder —
    * each step doubles the gap between occupied bit groups).
    */
  def mortonSpread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-value of two 16-bit keys: x on even bits, y on odd bits. */
  def zValue16(x: Column, y: Column): Column =
    mortonSpread16(x).bitwiseOR(shiftleft(mortonSpread16(y), 1))

  /** 8-bit Morton spread (even bit positions of a 16-bit lane). */
  def mortonSpread8(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x3333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x5555L))
  }

  /** 16-bit Z-value of two 8-bit keys. */
  def zValue8(x: Column, y: Column): Column =
    mortonSpread8(x).bitwiseOR(shiftleft(mortonSpread8(y), 1))

  /** Z-order layout audit: scale both (non-negative) keys to the 8-bit
    * curve lane by their max — the rank-then-interleave step every real
    * Z-order implementation performs, since raw key domains rarely fill a
    * lane — then bucket rows by the top `bucketBits` of the interleaved
    * Z-value (each bucket ≅ one target file after a Z-sorted write) and
    * report per bucket the count and min/max range of BOTH raw keys:
    * exactly the footer statistics a scan prunes on. Tight ranges on both
    * dimensions at once are the property Z-ordering buys and a plain sort
    * cannot (sorting on x makes y ranges span the full domain).
    *
    * All arithmetic is exact BIGINT (`(v · 256) div (max + 1)`), so the
    * audit hashes across engines. Scale shape: one tiny max-aggregate
    * broadcast onto a map-side projection, then one partial+final
    * aggregate on the bucket id (buckets × 6 numbers of shuffle). The
    * production write path is `repartitionByRange(zValue)` + sorted write
    * — same computation; the aggregate makes clustering quality hashable.
    */
  def zorderAudit(df: DataFrame, xCol: Column, yCol: Column,
                  bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 16,
      s"bucketBits must be in [1,16], got $bucketBits")
    val m = df.agg(max(xCol).as("__xm"), max(yCol).as("__ym"))
    df.select(xCol.as("__x"), yCol.as("__y"))
      .crossJoin(broadcast(m))
      .withColumn("__bucket",
        shiftright(zValue8(expr("(__x * 256) div (__xm + 1)"),
                           expr("(__y * 256) div (__ym + 1)")),
                   16 - bucketBits))
      .groupBy(col("__bucket").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
           min(col("__x")).as("x_min"), max(col("__x")).as("x_max"),
           min(col("__y")).as("y_min"), max(col("__y")).as("y_max"))
  }
}
