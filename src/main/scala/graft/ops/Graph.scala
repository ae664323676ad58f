package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation as Pregel-style relational rounds: each
  * iteration is one join (ranks onto out-edges) plus one aggregate
  * (contributions by destination) — the exact shape a 1000-executor
  * PageRank runs, with edges the large partitioned relation and ranks the
  * small per-node state. No driver-side loops over rows; the Scala `for`
  * only stacks plan rounds.
  */
object Graph {

  /** One rank unit = 1e12 — integer micro-units keep every contribution and
    * damping step in exact BIGINT arithmetic, so the result is
    * order-independent (float PageRank sums are not associative and cannot
    * hash-match across engines).
    */
  val RankBase = 1000000000000L

  /** Fixed-iteration damped PageRank over a directed edge list
    * `(src: string, dst: string)`. Every node must appear as a src (for the
    * symmetrized bipartite graphs this serves, that holds by construction;
    * dangling nodes would need a mass-redistribution term).
    *
    * Integer semantics, identical on any engine: contribution = `rank div
    * out_degree` (floor), new rank = `(RankBase·15) div 100 +
    * (Σcontrib·85) div 100`. Headroom: Σcontrib ≤ n_nodes·RankBase, so the
    * ×85 step overflows signed 64-bit only past ~10^5 nodes at this base —
    * at larger graphs drop RankBase a decade per 10× nodes (the ranks are
    * relative).
    *
    * Plan shape per round: broadcast the node-state relation (ranks — a row
    * per node, orders of magnitude below the edge count for the dense
    * graphs this serves) onto the edge relation, then sum contributions by
    * dst. The edge+degree relation is localCheckpointed once, pre-hashed on
    * `dst`, so every round is a single in-memory scan: the broadcast join
    * preserves the streamed side's partitioning and the groupBy(dst)
    * aggregate runs exchange-free. Measured at sf0.1 (≈0.9 M edges, 16.5 k
    * nodes): 5.9 → 1.0 s vs the shuffle-both-sides form. At a node count
    * too large to broadcast, the round degenerates to the classic
    * bucketed-join Pregel shape — same code minus the hint.
    */
  def pagerankFixed(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val edgesDeg = edges.join(broadcast(deg), Seq("src"))
      .repartition(col("dst"))
      .localCheckpoint()
    var ranks = deg.select(col("src").as("node"), lit(RankBase).as("rank"))
    for (_ <- 1 to iters) {
      ranks = edgesDeg
        .join(broadcast(ranks), edgesDeg("src") === ranks("node"))
        .select(col("dst"), expr("rank div d").as("__contrib"))
        .groupBy(col("dst"))
        .agg((lit(RankBase * 15 / 100) +
          expr("(sum(__contrib) * 85) div 100")).as("rank"))
        .select(col("dst").as("node"), col("rank"))
    }
    ranks
  }
}
