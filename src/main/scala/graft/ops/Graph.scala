package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation — the authority signal crawl
  * pipelines rank hosts/pages with before sampling (PageRank, Page et al.
  * 1999; Common Crawl publishes host-level harmonic centrality and
  * PageRank through its cc-webgraph releases for exactly this use). A
  * training-data pipeline consumes it as a quality prior: authority-
  * weighted sampling, low-authority domain down-weighting, canonical-page
  * choice among mirrors.
  *
  * Exactness split (the `kmeansStep` discipline): ranks live in
  * fixed-point MICRO-units as longs — per-edge contribution is integer
  * division `rank div out_degree` (floor; deterministic in any engine,
  * unlike a float divide whose per-dst summation ORDER differs), the
  * damped update is `base + damping·Σ div 100` in long arithmetic, and
  * the only double is the presentation column `rank = rank_micro / 1e6`.
  * Cross-engine hash-exact at any round count — the registered
  * `doc_link_rank` oracle replays three full rounds in SQL.
  *
  * Semantics notes (all deterministic, all mirrored by the oracle):
  *  - multigraph: parallel edges each carry a contribution (out_degree
  *    counts edge multiplicity);
  *  - dangling nodes (no out-edges) contribute nothing — their mass
  *    leaks, the simple-leak PageRank variant (redistribution would add
  *    a corpus-wide aggregate per round for no curation benefit);
  *  - integer floor per edge loses < out_degree micro per node per round
  *    (≤ 1e-6·deg of rank mass) — irrelevant to ordering, and the price
  *    of exactness.
  *
  * Scale shape: per round, ONE join of the edge table against the rank
  * table keyed on src (at 100 TB both sides pre-bucketed by node id, so
  * the join co-locates) and one map-side-combined sum keyed on dst —
  * shuffle volume is O(edges) per round, rounds are bounded and small
  * (authority signals saturate fast; CC ships ~20-round runs). Each
  * round's output is one narrow (node, long) table; lineage grows
  * linearly in rounds, so no checkpoint is needed at curation-scale round
  * counts — callers iterating dozens of rounds should `localCheckpoint`
  * every ~10.
  */
object Graph {

  private val Micro = 1000000L

  /** One damped update against the current `ranks` — the shared round
    * body of [[linkRank]] (fixed unrolled rounds, the oracle-bound form)
    * and [[linkRankConverged]] (movement-threshold stop). Pure integer
    * arithmetic, so both callers produce bitwise-identical trajectories.
    */
  private def rankRound(nodes: DataFrame, withDeg: DataFrame,
      ranks: DataFrame, base: Long, dampingPct: Long): DataFrame = {
    val contribs = withDeg
      .join(ranks.select(col("node").as("src"), col("rank_micro")), "src")
      .select(col("dst").as("node"), expr("rank_micro div odeg").as("c"))
      .groupBy(col("node")).agg(sum(col("c")).as("s"))
    nodes.join(contribs, Seq("node"), "left")
      .select(col("node"),
        (lit(base) + expr(s"($dampingPct * coalesce(s, 0L)) div 100"))
          .as("rank_micro"))
  }

  private def prepared(edges: DataFrame, srcCol: String, dstCol: String):
      (DataFrame, DataFrame) = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    (nodes, e.join(outDeg, "src"))
  }

  /** `rounds` integer-PageRank iterations over an edge list. Output: one
    * row per node — (node, rank_micro, rank), ordered by node. Lineage
    * grows linearly in rounds — fine at the registered 3; deep runs
    * belong on [[linkRankConverged]], whose per-round materialization
    * bounds lineage and stops at the fixpoint.
    */
  def linkRank(edges: DataFrame, rounds: Int = 3, dampingPct: Long = 85L,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(rounds >= 1, "need at least one round")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percentage")
    val (nodes, withDeg) = prepared(edges, srcCol, dstCol)
    val base = (100L - dampingPct) * Micro / 100L
    var ranks = nodes.withColumn("rank_micro", lit(Micro))
    for (_ <- 1 to rounds) ranks = rankRound(nodes, withDeg, ranks, base, dampingPct)
    ranks
      .withColumn("rank", col("rank_micro").cast("double") / 1000000.0)
      .orderBy(col("node"))
  }

  /** Result of a convergence run: final ranks (node, rank_micro, rank —
    * ordered by node), rounds actually executed, and the last round's
    * max |Δrank_micro| (≤ epsMicro iff the run stopped on convergence
    * rather than the round budget).
    */
  final case class LinkRankRun(ranks: DataFrame, rounds: Int, maxMoveMicro: Long)

  /** [[linkRank]] with a MOVEMENT-THRESHOLD stop — the deep-run form
    * (authority signals saturate over tens of rounds; a fixed round count
    * either wastes rounds or under-converges). Per round: one damped
    * integer update (bitwise [[linkRank]]'s trajectory), then a
    * `localCheckpoint` materialization — which simultaneously BOUNDS
    * LINEAGE (the round's plan starts from materialized partitions, so a
    * 50-round run never builds a 50-join tree) and feeds the movement
    * aggregate max |Δrank_micro| without recomputing the round. The
    * movement check is one narrow (node, long)-keyed join per round —
    * the price every convergence-stopped PageRank pays, O(nodes) against
    * the round's own O(edges) shuffle. Stops when movement < `epsMicro`
    * (strict, so 0 disables — the [[graft.ops.Similarity.kmeansTrain]]
    * convention) or at `maxRounds`.
    */
  def linkRankConverged(edges: DataFrame, maxRounds: Int = 50,
      epsMicro: Long = 100L, dampingPct: Long = 85L,
      srcCol: String = "src", dstCol: String = "dst"): LinkRankRun = {
    require(maxRounds >= 1, "need at least one round")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percentage")
    val (nodesRaw, withDegRaw) = prepared(edges, srcCol, dstCol)
    // both sides re-join every round — materialize once
    val nodes = nodesRaw.localCheckpoint(true)
    val withDeg = withDegRaw.localCheckpoint(true)
    val base = (100L - dampingPct) * Micro / 100L
    var ranks = nodes.withColumn("rank_micro", lit(Micro)).localCheckpoint(true)
    var rounds = 0
    var move = Long.MaxValue
    while (rounds < maxRounds && move >= epsMicro) {
      val next = rankRound(nodes, withDeg, ranks, base, dampingPct)
        .localCheckpoint(true)
      val mv = next.join(ranks.select(col("node"), col("rank_micro").as("prev")), "node")
        .agg(max(abs(col("rank_micro") - col("prev")))).head
      move = if (mv.isNullAt(0)) 0L else mv.getLong(0) // empty graph = fixpoint
      ranks = next
      rounds += 1
    }
    LinkRankRun(
      ranks.withColumn("rank", col("rank_micro").cast("double") / 1000000.0)
        .orderBy(col("node")),
      rounds, move)
  }
}
