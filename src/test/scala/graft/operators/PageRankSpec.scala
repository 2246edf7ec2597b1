package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val edges = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
    // noise the canonicalization must absorb: reversed dup, self-loop, dup
    (2L, 1L), (2L, 2L), (3L, 1L)
  ).toDF("src", "dst")

  /** The documented integer recurrence, straight-line. */
  private def reference(adj: Map[Long, Seq[Long]], iters: Int): Map[Long, Long] = {
    var pr = adj.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val shares = adj.toSeq.flatMap { case (u, nbrs) =>
        val share = pr(u) / nbrs.size
        nbrs.map(_ -> share)
      }
      pr = shares.groupBy(_._1).map { case (v, xs) =>
        v -> (150000L + BigInt(850000) * xs.map(_._2).sum / 1000000L).toLong
      }
    }
    pr
  }

  private val adj = Map(
    1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L), 3L -> Seq(1L, 2L, 4L), 4L -> Seq(3L))

  test("3-iteration ranks match the integer recurrence exactly") {
    val got = Graph.pageRank(edges, 3)
      .as[(Long, Long)].collect().toMap
    assert(got == reference(adj, 3))
  }

  test("the hub outranks the leaf and iteration count matters") {
    val got3 = Graph.pageRank(edges, 3).as[(Long, Long)].collect().toMap
    val got1 = Graph.pageRank(edges, 1).as[(Long, Long)].collect().toMap
    assert(got3(3L) > got3(4L), "degree-3 hub must outrank the leaf")
    assert(got1 == reference(adj, 1))
    assert(got1 != got3)
  }

  test("rank mass stays near N·10⁶ (truncation only loses ppm dust)") {
    val got = Graph.pageRank(edges, 3).as[(Long, Long)].collect()
    val total = got.map(_._2).sum
    val n = got.length
    assert(total <= n * 1000000L)
    assert(total > n * 1000000L - n * 20L, s"lost more than dust: $total")
  }
}
