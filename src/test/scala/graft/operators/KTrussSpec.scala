package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class KTrussSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def truss(edges: Seq[(Long, Long)], k: Int,
                    rounds: Int): Map[(Long, Long), Long] =
    Graph.kTruss(edges.toDF("src", "dst"), k, rounds)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  private def clique(ids: Seq[Long]) =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("the 4-truss of K4-plus-pendant-triangle is exactly K4") {
    // K4 edges each sit in 2 triangles; the pendant triangle's edges in 1
    val g = clique(Seq(1L, 2L, 3L, 4L)) ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val got = truss(g, k = 4, rounds = 3)
    assert(got.keySet == clique(Seq(1L, 2L, 3L, 4L)).toSet)
    assert(got.values.forall(_ == 2L), "every K4 edge closes 2 triangles")
  }

  test("peel cascades: losing the pendant drops nothing further in K5") {
    val g = clique(Seq(1L, 2L, 3L, 4L, 5L)) ++ Seq((5L, 6L), (5L, 7L), (6L, 7L))
    val got = truss(g, k = 5, rounds = 3)
    assert(got.keySet == clique(Seq(1L, 2L, 3L, 4L, 5L)).toSet)
    assert(got.values.forall(_ == 3L))
  }

  test("a triangle-free graph trusses to empty; extra rounds are no-ops") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(truss(square, k = 3, rounds = 2).isEmpty)
    val g = clique(Seq(1L, 2L, 3L, 4L))
    assert(truss(g, k = 4, rounds = 1) == truss(g, k = 4, rounds = 4),
      "converged: fixed-round result is the fixpoint")
  }
}
