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

  /** `rounds` integer-PageRank iterations over an edge list. Output: one
    * row per node — (node, rank_micro, rank), ordered by node.
    */
  def linkRank(edges: DataFrame, rounds: Int = 3, dampingPct: Long = 85L,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(rounds >= 1, "need at least one round")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percentage")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    val withDeg = e.join(outDeg, "src")
    val base = (100L - dampingPct) * Micro / 100L
    var ranks = nodes.withColumn("rank_micro", lit(Micro))
    for (_ <- 1 to rounds) {
      val contribs = withDeg
        .join(ranks.select(col("node").as("src"), col("rank_micro")), "src")
        .select(col("dst").as("node"), expr("rank_micro div odeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampingPct * coalesce(s, 0L)) div 100"))
            .as("rank_micro"))
    }
    ranks
      .withColumn("rank", col("rank_micro").cast("double") / 1000000.0)
      .orderBy(col("node"))
  }
}
