package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** R102: multi-source weighted shortest paths (Bellman-Ford rounds). */
class SsspSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sssp(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                   rounds: Int = 20): Map[Long, Long] =
    Graph.shortestPathsWeighted(edges.toDF("src", "dst", "w"),
        seeds.toDF("node"), rounds)
      .as[(Long, Long)].collect().toMap

  test("a cheap long path beats an expensive direct edge") {
    // 1→4 direct costs 10; 1→2→3→4 costs 3 — hop-count BFS would pick
    // the direct edge, weighted relaxation must not
    val g = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    assert(sssp(g, Seq(1L)) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("multi-source: every node takes its NEAREST seed") {
    val path = (1L to 6L).map(i => (i, i + 1, 2L)) // line 1..7, cost 2/hop
    val got = sssp(path, Seq(1L, 7L))
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 4L, 4L -> 6L,
      5L -> 4L, 6L -> 2L, 7L -> 0L))
  }

  test("parallel edges collapse to the cheapest; orientation is ignored") {
    val g = Seq((1L, 2L, 9L), (2L, 1L, 3L), (1L, 2L, 5L))
    assert(sssp(g, Seq(1L)) == Map(1L -> 0L, 2L -> 3L))
  }

  test("unreached components are absent") {
    val g = Seq((1L, 2L, 1L), (3L, 4L, 1L))
    assert(sssp(g, Seq(1L)) == Map(1L -> 0L, 2L -> 1L))
  }

  test("fixed rounds truncate like Bellman-Ford (contract with the oracle)") {
    // cost-1 chain of length 5 from the seed, 2 rounds → only 2 edges out
    val path = (1L to 5L).map(i => (i, i + 1, 1L))
    assert(sssp(path, Seq(1L), rounds = 2) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
