package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class BoruvkaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], phases: Int) =
    Graph.boruvkaForest(edges.toDF("src", "dst", "w"), phases)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("a path's MST is the path itself; the middle edge waits a phase") {
    // phase 1: both ends of 2-3 prefer their cheaper incident edge, so
    // components {1,2} and {3,4} form first; phase 2 bridges them
    val path = Seq((1L, 2L, 5L), (2L, 3L, 7L), (3L, 4L, 6L))
    val got = run(path, 2)
    assert(got == Set((1L, 2L, 5L, 1L), (3L, 4L, 6L, 1L), (2L, 3L, 7L, 2L)))
  }

  test("a cycle drops exactly its heaviest edge") {
    val cycle = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 1L, 9L))
    val got = run(cycle, 3).map(e => (e._1, e._2))
    assert(got == Set((1L, 2L), (2L, 3L), (3L, 4L)))
  }

  test("phase 2 bridges the two phase-1 clusters by the cheapest cut edge") {
    // two tight pairs joined by two candidate bridges (7 beats 8)
    val e = Seq((1L, 2L, 1L), (3L, 4L, 1L), (2L, 3L, 7L), (1L, 4L, 8L))
    val got = run(e, 2)
    assert(got.map(x => (x._1, x._2)) == Set((1L, 2L), (3L, 4L), (2L, 3L)))
    assert(got.find(x => x._1 == 2L && x._2 == 3L).get._4 == 2L)
  }

  test("K4 with equal weights: the (w, a, b) order makes the pick unique") {
    val k4 = Seq((1L, 2L, 5L), (1L, 3L, 5L), (1L, 4L, 5L), (2L, 3L, 5L),
      (2L, 4L, 5L), (3L, 4L, 5L))
    val got = run(k4, 3)
    // every component picks its (w, a, b)-minimal edge: 1-2 for {1,2},
    // 1-3 for {3}, 1-4 for {4} — spanning tree rooted at 1, one phase
    assert(got == Set((1L, 2L, 5L, 1L), (1L, 3L, 5L, 1L), (1L, 4L, 5L, 1L)))
  }

  test("a disconnected graph yields a forest, one tree per component") {
    val e = Seq((1L, 2L, 3L), (10L, 11L, 4L), (11L, 12L, 2L))
    val got = run(e, 2).map(x => (x._1, x._2))
    assert(got == Set((1L, 2L), (10L, 11L), (11L, 12L)))
  }
}
