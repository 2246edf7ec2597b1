package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** R100: 4-clique percolation (CPM) communities. */
class Percolation4Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def communities(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] =
    Graph.cliquePercolation4(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (n, rs) => n -> rs.map(_._2).toSet }

  private def qid(a: Long, b: Long, c: Long, d: Long): Long =
    a * (1L << 45) + b * (1L << 30) + c * (1L << 15) + d

  private def k4(ns: Long*): Seq[(Long, Long)] =
    for (a <- ns; b <- ns if a < b) yield (a, b)

  test("two K4s sharing an EDGE stay separate (3-CPM merges them)") {
    // K4 on 1-2-3-4 and K4 on 3-4-5-6 share edge (3,4): their triangles
    // touch through it, so cliquePercolation3 fuses them — one shared
    // edge is only 2 vertices, so no K4 adjacency crosses it here
    val g = (k4(1L, 2L, 3L, 4L) ++ k4(3L, 4L, 5L, 6L)).distinct
    val got = communities(g)
    val c1 = qid(1, 2, 3, 4)
    val c2 = qid(3, 4, 5, 6)
    assert(got(1L) == Set(c1) && got(5L) == Set(c2))
    assert(got(3L) == Set(c1, c2) && got(4L) == Set(c1, c2),
      "shared-edge nodes overlap both communities, but the communities stay distinct")
    val merged3 = Graph.cliquePercolation3(g.toDF("src", "dst"))
      .as[(Long, Long)].collect().map(_._2).toSet
    assert(merged3.size == 1, "sanity: 3-CPM DOES merge through the shared edge")
  }

  test("two K4s sharing a TRIANGLE percolate into one community") {
    val g = (k4(1L, 2L, 3L, 4L) ++ k4(2L, 3L, 4L, 5L)).distinct
    val got = communities(g)
    val label = qid(1, 2, 3, 4) // min packed K4 id
    assert(got == (1L to 5L).map(_ -> Set(label)).toMap)
  }

  test("a K5's five K4s collapse to one community") {
    val got = communities(k4(1L, 2L, 3L, 4L, 5L))
    val label = qid(1, 2, 3, 4)
    assert(got == (1L to 5L).map(_ -> Set(label)).toMap)
  }

  test("K4-free graphs have no communities") {
    // two triangles sharing an edge: plenty of 3-CPM structure, no K4
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(communities(g).isEmpty)
  }

  test("a lone K4 is its own community") {
    val got = communities(k4(7L, 9L, 11L, 13L))
    val label = qid(7, 9, 11, 13)
    assert(got == Seq(7L, 9L, 11L, 13L).map(_ -> Set(label)).toMap)
  }
}
