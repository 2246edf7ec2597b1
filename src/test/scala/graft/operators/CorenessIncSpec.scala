package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** R99: incremental coreness maintenance ≡ full recompute. */
class CorenessIncSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def inc(base: Seq[(Long, Long)], delta: Seq[(Long, Long)],
                  maxK: Int = 4): Map[Long, Long] = {
    val baseDf = base.toDF("src", "dst")
    val labels = Graph.coreness(baseDf, maxK, roundsPerLevel = 30)
    Graph.corenessIncremental(labels, baseDf, delta.toDF("src", "dst"),
        maxK, rounds = 30)
      .as[(Long, Long)].collect().toMap
  }

  private def full(edges: Seq[(Long, Long)], maxK: Int = 4): Map[Long, Long] =
    Graph.coreness(edges.toDF("src", "dst"), maxK, roundsPerLevel = 30)
      .as[(Long, Long)].collect().toMap

  test("promotion cascade: one closing edge promotes the whole cycle") {
    // path 1-2-…-8 (all coreness 1); delta edge (1,8) closes the cycle
    // and promotes EVERY node to 2 — the effect propagates the full
    // graph away from the arrival, the case naive locality heuristics
    // (only re-label near the new edge) get wrong
    val path = (1L to 7L).map(i => (i, i + 1))
    val delta = Seq((1L, 8L))
    val got = inc(path, delta)
    assert(got == full(path ++ delta))
    assert(got.values.toSet == Set(2L), "every cycle node promoted to 2")
  }

  test("mixed graph: dense core, attached triangle, promoting delta") {
    // base: K5 on 1-5 (coreness 4), triangle 6-7-8 hung off node 5,
    // pendant 9; delta densifies 5-6-7-8 into a K4 and attaches node 10
    val k5 = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)
    val base = k5 ++ Seq((5L, 6L), (6L, 7L), (7L, 8L), (6L, 8L), (8L, 9L))
    val delta = Seq((5L, 7L), (5L, 8L), (9L, 10L))
    assert(inc(base, delta) == full(base ++ delta))
  }

  test("delta that duplicates base edges changes nothing") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val got = inc(base, Seq((2L, 1L), (3L, 3L), (1L, 3L)))
    assert(got == full(base))
  }

  test("delta introducing brand-new nodes labels them too") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val delta = Seq((4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    assert(inc(base, delta) == full(base ++ delta))
  }

  test("arrivals inside the old core leave distant labels untouched") {
    // two K4 islands; delta adds an edge within island one — island two's
    // labels must come straight from the base pass
    val k4a = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val k4b = for (a <- 11L to 14L; b <- 11L to 14L if a < b) yield (a, b)
    val base = (k4a ++ k4b).filterNot(_ == (1L, 3L))
    val delta = Seq((1L, 3L))
    assert(inc(base, delta) == full(base ++ delta))
  }
}
