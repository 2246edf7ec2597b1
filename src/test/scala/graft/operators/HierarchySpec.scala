package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Coreness / trussness hierarchy labeling (R94/R95). */
class HierarchySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def coreness(edges: Seq[(Long, Long)], maxK: Int,
                       rounds: Int): Map[Long, Long] =
    Graph.coreness(edges.toDF("src", "dst"), maxK, rounds)
      .as[(Long, Long)].collect().toMap

  private def trussness(edges: Seq[(Long, Long)], maxK: Int,
                        rounds: Int): Map[(Long, Long), Long] =
    Graph.trussness(edges.toDF("src", "dst"), maxK, rounds)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  private val clique5 =
    (for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)).toSeq

  test("coreness stratifies clique, cycle appendage, and pendant path") {
    // K5 (coreness 4) -- 5-6-7-8-5 square sharing node 5 (coreness 2)
    // -- pendant path 8-9-10 (coreness 1)
    val g = clique5 ++ Seq((5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L),
      (8L, 9L), (9L, 10L))
    val got = coreness(g, maxK = 4, rounds = 5)
    val want = (1L to 5L).map(_ -> 4L).toMap ++
      Map(6L -> 2L, 7L -> 2L, 8L -> 2L, 9L -> 1L, 10L -> 1L)
    assert(got == want)
  }

  test("coreness levels are nested: level-k set equals the standalone k-core") {
    val g = clique5 ++ Seq((5L, 6L), (6L, 7L), (7L, 5L), (7L, 8L))
    val byLevel = coreness(g, maxK = 4, rounds = 5)
    for (k <- 1 to 4) {
      val standalone = Graph.kCore(g.toDF("src", "dst"), k, rounds = 6)
        .as[(Long, Long)].collect().map(_._1).toSet
      assert(byLevel.filter(_._2 >= k).keySet == standalone,
        s"level $k mismatch")
    }
  }

  test("coreness caps at maxK even when the graph is denser") {
    val got = coreness(clique5, maxK = 2, rounds = 3)
    assert(got == (1L to 5L).map(_ -> 2L).toMap)
  }

  test("trussness: clique 5, shared triangle 3, bridge 2") {
    // K5 edges sit in 3 triangles each -> trussness 5; a triangle
    // hanging off node 5 -> 3; a bare bridge -> 2
    val g = clique5 ++ Seq((5L, 6L), (5L, 7L), (6L, 7L), (7L, 8L))
    val got = trussness(g, maxK = 5, rounds = 4)
    val want =
      (for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b) -> 5L).toMap ++
        Map((5L, 6L) -> 3L, (5L, 7L) -> 3L, (6L, 7L) -> 3L, (7L, 8L) -> 2L)
    assert(got == want)
  }

  test("trussness is edge-complete and canonicalized") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (3L, 3L), (3L, 4L))
    val got = trussness(messy, maxK = 4, rounds = 3)
    assert(got == Map((1L, 2L) -> 3L, (1L, 3L) -> 3L, (2L, 3L) -> 3L,
      (3L, 4L) -> 2L))
  }
}
