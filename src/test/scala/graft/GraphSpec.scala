package graft

import graft.ops.Graph
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    Graph.pagerankFixed(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("pagerankFixed: symmetric 2-cycle stays at the fixed point") {
    // a<->b: each node forwards its whole rank, so damping holds ranks at
    // exactly 15% base + 85% base = base every round
    val out = ranks(Seq("a" -> "b", "b" -> "a"), 3)
    assert(out == Map("a" -> Graph.RankBase, "b" -> Graph.RankBase))
  }

  test("pagerankFixed: star center accumulates rank, leaves stay symmetric") {
    val leaves = Seq("l1", "l2", "l3")
    val edges = leaves.flatMap(l => Seq("hub" -> l, l -> "hub"))
    val out = ranks(edges, 3)
    assert(out("hub") > out("l1"), "hub must out-rank a leaf")
    assert(leaves.map(out).distinct.size == 1, "leaves are symmetric")
  }

  test("pagerankFixed: one round matches the integer formula exactly") {
    // hub out-degree 2, leaves out-degree 1, all start at RankBase:
    //   leaf  <- 15% + 85% of (RankBase div 2)
    //   hub   <- 15% + 85% of (RankBase + RankBase)
    val edges = Seq("hub" -> "l1", "hub" -> "l2", "l1" -> "hub", "l2" -> "hub")
    val out = ranks(edges, 1)
    val base = Graph.RankBase
    assert(out("l1") == base * 15 / 100 + (base / 2) * 85 / 100)
    assert(out("hub") == base * 15 / 100 + (2 * base) * 85 / 100)
  }

  test("pagerankFixed: total mass is conserved up to integer-floor loss") {
    // every div floors, so each round can only LOSE mass (never create it),
    // and by at most (n_edges + n_nodes) units per round
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a",
                    "b" -> "a", "c" -> "b", "a" -> "c")
    val out = ranks(edges, 3)
    val total = out.values.sum
    val ideal = 3 * Graph.RankBase
    assert(total <= ideal)
    assert(ideal - total <= 3L * (edges.size + out.size) * 100)
  }
}
