package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** R98: 3-clique percolation (CPM) communities. */
class PercolationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def communities(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] =
    Graph.cliquePercolation3(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (n, rs) => n -> rs.map(_._2).toSet }

  private def tid(a: Long, b: Long, c: Long): Long =
    a * (1L << 40) + b * (1L << 20) + c

  test("two triangle cliques joined by a bridge edge stay separate") {
    // triangles 1-2-3 and 4-5-6; bridge 3-4 carries no triangle
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L))
    val got = communities(g)
    val c1 = tid(1, 2, 3)
    val c2 = tid(4, 5, 6)
    assert(got == Map(1L -> Set(c1), 2L -> Set(c1), 3L -> Set(c1),
      4L -> Set(c2), 5L -> Set(c2), 6L -> Set(c2)),
      "plain CC would fuse everything through the bridge; CPM must not")
  }

  test("edge-sharing triangles percolate into one community") {
    // K4 on 1..4: all 4 triangles pairwise share edges -> one community
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val got = communities(k4)
    val label = tid(1, 2, 3) // min packed triangle id
    assert(got == (1L to 4L).map(_ -> Set(label)).toMap)
  }

  test("overlap: a shared node belongs to BOTH communities") {
    // triangles 1-2-3 and 3-4-5 share only node 3 (not an edge)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
    val got = communities(g)
    val c1 = tid(1, 2, 3)
    val c2 = tid(3, 4, 5)
    assert(got(3L) == Set(c1, c2), "node 3 must be in both communities")
    assert(got(1L) == Set(c1) && got(5L) == Set(c2))
  }

  test("triangle-free graphs have no communities") {
    assert(communities(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).isEmpty)
  }
}
