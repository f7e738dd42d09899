package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.{ScoredId, TopKByValue}
import graft.vector.HashingEmbedder

/** ScalaCheck properties for the pure kernels (no SparkSession needed). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val texts: Gen[String] =
    Gen.listOf(Gen.oneOf("spark", "join", "key", "row", "the", "a", "scan"))
      .map(_.mkString(" "))

  test("embedder: deterministic, fixed-dim, unit-norm (or zero for empty)") {
    check(Prop.forAll(texts) { t =>
      val v1 = HashingEmbedder.embed(t, 64)
      val v2 = HashingEmbedder.embed(t, 64)
      val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
      v1.toSeq == v2.toSeq && v1.length == 64 &&
        (math.abs(norm - 1.0) < 1e-6 || norm == 0.0)
    })
  }

  test("embedder: insensitive to surrounding whitespace") {
    check(Prop.forAll(texts) { t =>
      HashingEmbedder.embed(t, 32).toSeq == HashingEmbedder.embed(s" $t ", 32).toSeq
    })
  }

  private val scored: Gen[List[ScoredId]] =
    Gen.listOf(Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0L, 50L))
      .map { case (v, i) => ScoredId(v, i) })

  test("top-k aggregator: any reduce/merge split equals global sort take k") {
    val agg = new TopKByValue(5)
    val ord: Ordering[ScoredId] = Ordering.by(s => (-s.value, s.id))
    check(Prop.forAll(scored, Gen.choose(0, 10)) { (xs, splitSeed) =>
      val expected = xs.sorted(ord).take(5)
      val (l, r) = xs.partition(s => (s.id + splitSeed) % 3 == 0)
      val partL = l.foldLeft(agg.zero)(agg.reduce)
      val partR = r.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(partL, partR)) == expected &&
        agg.finish(agg.merge(partR, partL)) == expected
    })
  }
}
