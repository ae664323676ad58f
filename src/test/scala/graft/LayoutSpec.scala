package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mortonSpread8/zValue8 match a reference bit interleave") {
    val ref = (x: Long, y: Long) =>
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) |
                           (((y >> i) & 1L) << (2 * i + 1))).sum
    val pairs = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
                    (1L, 2L), (170L, 85L), (129L, 64L))
    val got = pairs.toDF("x", "y")
      .select(Layout.zValue8(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == pairs.map { case (x, y) => ref(x, y) })
  }

  test("zorderAudit: buckets partition the rows and bound BOTH key ranges") {
    // a full 64x64 grid: with 8-bit lanes and 256 buckets, each bucket is
    // one 16x16 Z-cell of the scaled domain -> both per-bucket raw ranges
    // must be ~1/16 of the domain, which a single-column sort cannot give
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val out = Layout.zorderAudit(grid.toDF("x", "y"), col("x"), col("y"), 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(out.map(_._2).sum == grid.size, "buckets partition the input")
    assert(out.length == 256)
    out.foreach { case (b, _, xmin, xmax, ymin, ymax) =>
      assert(xmax - xmin <= 3 && ymax - ymin <= 3,
        s"bucket $b spans x[$xmin,$xmax] y[$ymin,$ymax] — not a Z-cell")
    }
  }

  test("rendezvousMoveAudit: growing 8→9 moves ~1/9 of keys, balanced both maps") {
    val keys = (1L to 2000L).map(Tuple1(_)).toDF("k")
    val r = Layout.rendezvousMoveAudit(keys, "k", 8, 9).collect().head
    assert(r.getLong(2) == 2000L)
    val frac = r.getDouble(4)
    // E[move] = 1/9 ≈ 0.111; binomial sd at n=2000 ≈ 0.007 → ±5 sd
    assert(frac > 0.075 && frac < 0.148, s"move_frac $frac")
    // balance: per-shard counts near n/shards on both maps (±40%)
    assert(r.getLong(5) > 150L && r.getLong(6) < 350L, r.toString)   // 8 shards: 250
    assert(r.getLong(7) > 130L && r.getLong(8) < 320L, r.toString)   // 9 shards: 222
  }

  test("rendezvousMoveAudit: identical shard maps move nothing") {
    val keys = (1L to 500L).map(Tuple1(_)).toDF("k")
    val r = Layout.rendezvousMoveAudit(keys, "k", 6, 6).collect().head
    assert(r.getLong(3) == 0L && r.getDouble(4) == 0.0, r.toString)
  }

  test("rendezvousMoveAudit: the shard argmax is a map-side projection — no join, no explode") {
    val keys = (1L to 100L).map(Tuple1(_)).toDF("k")
    val plan = Layout.rendezvousMoveAudit(keys, "k", 4, 5)
      .queryExecution.executedPlan.toString
    // the only joins allowed are the 1-row broadcast combines at the top
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Generate"), "no explode: the argmax is array_max over literals\n" + plan)
  }
}
