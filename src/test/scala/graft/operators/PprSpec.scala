package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  iters: Int): Map[Long, Long] = {
    val e = edges.toDF("src", "dst")
    val s = seeds.toDF("node")
    Graph.personalizedPageRank(e, s, iters)
      .as[(Long, Long)].collect().toMap
  }

  /** Driver-side replay of the exact integer recursion. */
  private def ref(edges: Seq[(Long, Long)], seeds: Set[Long],
                  iters: Int): Map[Long, Long] = {
    val und = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter(e => e._1 != e._2).distinct
    val dir = und ++ und.map(_.swap)
    val deg = dir.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val nodes = deg.keySet ++ seeds
    var pr: Map[Long, Long] =
      nodes.map(n => n -> (if (seeds(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val inflow = dir.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum
      }
      pr = nodes.map { n =>
        val tele = if (seeds(n)) 150000L else 0L
        n -> (tele + 850000L * inflow.getOrElse(n, 0L) / 1000000L)
      }.toMap
    }
    pr
  }

  // two components: a path 1-2-3-4 and an edge 10-11
  private val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))

  test("matches the integer reference on a two-component graph") {
    for (it <- 1 to 4)
      assert(run(edges, Seq(1L, 3L), it) == ref(edges, Set(1L, 3L), it),
        s"iterations=$it diverged")
  }

  test("nodes unreachable from the seed set stay exactly 0 and are kept") {
    val got = run(edges, Seq(1L), 3)
    assert(got.contains(10L) && got.contains(11L))
    assert(got(10L) == 0L && got(11L) == 0L)
    assert(got(2L) > 0L)
  }

  test("duplicate seed ids are idempotent (set semantics)") {
    assert(run(edges, Seq(1L, 1L, 1L, 3L), 3) == run(edges, Seq(1L, 3L), 3))
  }

  test("an isolated seed (no edges) is reported with its teleport mass") {
    val got = run(edges, Seq(99L), 2)
    assert(got(99L) == 150000L)
    // and everything else in the graph is 0 — no seed reaches it
    assert(edges.flatMap(e => Seq(e._1, e._2)).forall(got(_) == 0L))
  }

  test("teleport concentrates rank near the seed") {
    val got = run(edges, Seq(1L), 3)
    assert(got(1L) > got(3L) && got(2L) > got(4L))
  }
}
