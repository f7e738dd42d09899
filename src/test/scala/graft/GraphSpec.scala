package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSpec {

  private def ranks(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.linkRank(edges.toDF("src", "dst"), rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("ring is the stationary point: every node holds exactly 1e6 micro forever") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    for (rounds <- Seq(1, 3, 7)) {
      val got = ranks(ring, rounds)
      assert(got == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L),
        s"uniform in-mass must reproduce the uniform rank at $rounds rounds")
    }
  }

  test("star with a dangling hub: hand-computed two rounds, mass leaks, order correct") {
    // 2 -> 1, 3 -> 1; node 1 has NO out-edges (dangling: contributes nothing)
    val star = Seq((2L, 1L), (3L, 1L))
    val r1 = ranks(star, 1)
    // round 1: hub gets 150000 + 85*(1e6 + 1e6)/100; leaves get the base
    assert(r1 == Map(1L -> 1850000L, 2L -> 150000L, 3L -> 150000L))
    val r2 = ranks(star, 2)
    // round 2: leaves now hold 150000 each -> hub 150000 + 85*300000/100
    assert(r2 == Map(1L -> 405000L, 2L -> 150000L, 3L -> 150000L))
    // dangling leak: total mass strictly decreases across rounds
    assert(r2.values.sum < r1.values.sum && r1.values.sum < 3000000L)
    // authority ordering survives the leak
    assert(r2(1L) > r2(2L))
  }

  test("multigraph semantics: parallel edges each carry a contribution") {
    // 2 -> 1 twice (odeg 2, both to the same dst) vs 2 -> 1 once (odeg 1):
    // identical mass lands on node 1 either way when the rank is even
    val twice = ranks(Seq((2L, 1L), (2L, 1L)), 1)
    val once = ranks(Seq((2L, 1L)), 1)
    assert(twice(1L) == once(1L),
      "two half-contributions along parallel edges equal one whole")
    // split across DIFFERENT dsts halves each side
    val split = ranks(Seq((2L, 1L), (2L, 3L)), 1)
    assert(split(1L) == 150000L + 85L * 500000L / 100L && split(1L) == split(3L))
  }

  test("random graphs: distributed ranks equal a single-node reference bitwise") {
    import spark.implicits._
    // deterministic seeded graphs, self-loops/parallel edges/dangling nodes
    // all in range — the reference runs the identical integer recurrence
    for (seed <- Seq(1, 2, 3, 4, 5)) {
      val rnd = new scala.util.Random(seed)
      val n = 5 + rnd.nextInt(20)
      val edges = Seq.fill(3 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val rounds = 1 + rnd.nextInt(3)
      val got = Graph.linkRank(edges.toDF("src", "dst"), rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: same multigraph/dangling/floor semantics, driver-side
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val odeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var rank = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to rounds) {
        val sums = edges.groupBy(_._2).view.mapValues(
          _.map(e => rank(e._1) / odeg(e._1)).sum).toMap
        rank = nodes.map(v => v -> (150000L + 85L * sums.getOrElse(v, 0L) / 100L)).toMap
      }
      assert(got == rank, s"seed $seed: distributed must equal the reference exactly")
    }
  }

  test("convergence mode: deep run stops on movement, trajectory matches the unrolled form bitwise") {
    import spark.implicits._
    // a larger random graph (self-loops, parallel edges, dangling nodes in
    // range) that needs a DEEP run — the fixed-round form would either
    // waste rounds or under-converge here
    val rnd = new scala.util.Random(42)
    val n = 800
    val edges = Seq.fill(3 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .toDF("src", "dst").localCheckpoint(true)
    val run = Graph.linkRankConverged(edges, maxRounds = 60, epsMicro = 25L)
    assert(run.rounds >= 20 && run.rounds < 60,
      s"the graph must genuinely need a deep run and then stop on movement, ran ${run.rounds}")
    assert(run.maxMoveMicro < 25L,
      s"stopped on convergence, not the budget (last move ${run.maxMoveMicro})")
    // bitwise trajectory pin: the converged ranks equal linkRank unrolled
    // to exactly the executed round count — per-round localCheckpoint
    // materialization changes lineage, never values
    val got = run.ranks.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val unrolled = Graph.linkRank(edges, rounds = run.rounds).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == unrolled, "converged trajectory ≡ unrolled trajectory")
    // one more round past the stop moves nothing beyond the threshold —
    // the stop is a genuine fixpoint region, not a lucky dip
    val more = Graph.linkRank(edges, rounds = run.rounds + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val drift = got.map { case (node, rm) => math.abs(more(node) - rm) }.max
    assert(drift < 25L, s"movement stays under the threshold after the stop (drift $drift)")
    // epsMicro = 0 disables the stop: exactly maxRounds run
    val fixed = Graph.linkRankConverged(edges, maxRounds = 3, epsMicro = 0L)
    assert(fixed.rounds == 3, "strict comparison: 0 never fires")
  }

  test("integer arithmetic is exact: floor division, never a float sum") {
    // odeg 3 with rank 1e6: contribution floor(1e6/3) = 333333 each;
    // dst sums three of them -> 999999 (the 1-micro floor loss), damped
    val fan = Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 5L), (3L, 5L), (4L, 5L))
    val got = ranks(fan, 2)
    // round 1: 2,3,4 each get 150000 + 85*333333/100 = 150000 + 283333
    // round 2: 5 gets 150000 + 85*(3*433333)/100 = 150000 + 1104999
    assert(got(5L) == 150000L + 85L * (3L * 433333L) / 100L,
      s"exact long trajectory, got ${got(5L)}")
  }
}
