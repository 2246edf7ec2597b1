package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class KCoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    Graph.kCore(edges.toDF("src", "dst"), k, rounds)
      .as[(Long, Long)].collect().toMap

  // triangle 1-2-3 with a pendant path 3-4-5-6: under k = 2 the path
  // peels ONE NODE PER ROUND from the free end (6 is degree-1, then 5
  // becomes degree-1, then 4) — the deep-peel case fixed rounds must ride
  // out.
  private val trianglePlusPath = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))

  test("fixed-round peel reaches the fixpoint on a deep-peel chain") {
    val atFixpoint = Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    assert(core(trianglePlusPath, k = 2, rounds = 3) == atFixpoint)
    // monotone: extra rounds past convergence are no-ops
    assert(core(trianglePlusPath, k = 2, rounds = 5) == atFixpoint)
  }

  test("too few rounds leaves the partially-peeled residue") {
    // round 1 deletes only node 6; 4-5 still hang off the triangle
    val afterOne = core(trianglePlusPath, k = 2, rounds = 1)
    assert(afterOne.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(afterOne(5L) == 1L, "5 lost its pendant neighbor but survives round 1")
  }

  test("3-core of a clique with tails is the clique, at full degree") {
    val clique5 = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)
    val tails = Seq((5L, 6L), (6L, 7L), (1L, 8L))
    val got = core(clique5 ++ tails, k = 3, rounds = 4)
    assert(got == (1L to 5L).map(_ -> 4L).toMap)
  }

  test("a graph thinner than k peels to empty") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(core(square, k = 3, rounds = 2).isEmpty)
    // but the square IS its own 2-core
    assert(core(square, k = 2, rounds = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("canonicalizes duplicates, reversed edges, and self-loops") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(core(messy, k = 2, rounds = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
