package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** R101: incremental trussness maintenance ≡ full recompute. */
class TrussnessIncSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def inc(base: Seq[(Long, Long)], delta: Seq[(Long, Long)],
                  maxK: Int = 4): Map[(Long, Long), Long] = {
    val baseDf = base.toDF("src", "dst")
    val labels = Graph.trussness(baseDf, maxK, roundsPerLevel = 30)
    Graph.trussnessIncremental(labels, baseDf, delta.toDF("src", "dst"),
        maxK, rounds = 30)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, t) => (a, b) -> t }.toMap
  }

  private def full(edges: Seq[(Long, Long)],
                   maxK: Int = 4): Map[(Long, Long), Long] =
    Graph.trussness(edges.toDF("src", "dst"), maxK, roundsPerLevel = 30)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, t) => (a, b) -> t }.toMap

  // octahedron (K2,2,2): vertices 1..6, all pairs except the matching
  // (1,2), (3,4), (5,6); every edge sits in exactly two triangles
  private val octahedron: Seq[(Long, Long)] =
    (for (a <- 1L to 6L; b <- 1L to 6L if a < b) yield (a, b))
      .filterNot(e => e == (1L, 2L) || e == (3L, 4L) || e == (5L, 6L))

  test("promotion cascade: one closing edge re-trusses the whole ring") {
    // octahedron minus (1,3): the 4-truss peel cascades to nothing, all
    // edges sit at trussness 3; the delta edge restores BOTH lost
    // triangles and every edge of the ring promotes to 4 — including
    // edges sharing no vertex with the arrival
    val base = octahedron.filterNot(_ == (1L, 3L))
    val delta = Seq((1L, 3L))
    val baseline = full(base)
    assert(baseline.values.max == 3L, "sanity: broken ring peels out of the 4-truss")
    val got = inc(base, delta)
    assert(got == full(octahedron))
    assert(got.values.toSet == Set(4L), "every edge promoted to 4")
  }

  test("mixed graph: K5 truss, pendant triangle, promoting delta") {
    val k5 = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)
    val base = k5 ++ Seq((5L, 6L), (6L, 7L), (5L, 7L), (7L, 8L))
    val delta = Seq((4L, 6L), (4L, 7L)) // densifies 4-5-6-7 into a K4
    assert(inc(base, delta) == full(base ++ delta))
  }

  test("delta that duplicates base edges changes nothing") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(inc(base, Seq((2L, 1L), (3L, 1L), (4L, 4L))) == full(base))
  }

  test("delta introducing brand-new nodes labels their edges too") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val delta = Seq((4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    assert(inc(base, delta) == full(base ++ delta))
  }

  test("arrivals inside one island leave the other island's labels alone") {
    val k4a = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val k4b = for (a <- 11L to 14L; b <- 11L to 14L if a < b) yield (a, b)
    val base = (k4a ++ k4b).filterNot(_ == (1L, 3L))
    assert(inc(base, Seq((1L, 3L))) == full(k4a ++ k4b))
  }
}
