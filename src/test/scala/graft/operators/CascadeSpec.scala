package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class CascadeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long], pPpm: Long,
                  rounds: Int): Map[Long, Long] =
    Graph.independentCascade(edges.toDF("src", "dst"), seeds.toDF("node"),
        pPpm, rounds)
      .as[(Long, Long)].collect().toMap

  private def h48(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Driver replay: BFS on the md5-coin live subgraph. */
  private def ref(edges: Seq[(Long, Long)], seeds: Seq[Long], pPpm: Long,
                  rounds: Int): Map[Long, Long] = {
    val live = edges.distinct.filter { case (u, v) =>
      h48(s"$u:$v") % 1000000L < pPpm
    }
    var settled = seeds.distinct.map(_ -> 0L).toMap
    var frontier = settled.keySet
    for (r <- 1 to rounds if frontier.nonEmpty) {
      val next = live.filter(e => frontier(e._1)).map(_._2).toSet -- settled.keySet
      settled = settled ++ next.map(_ -> r.toLong)
      frontier = next
    }
    settled
  }

  private val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (5L, 4L),
    (4L, 6L), (2L, 6L))

  test("cascade equals the md5-coin BFS replay at several probabilities") {
    for (p <- Seq(0L, 250000L, 500000L, 750000L, 1000000L))
      assert(run(chain, Seq(1L), p, 3) == ref(chain, Seq(1L), p, 3),
        s"pPpm=$p diverged")
  }

  test("p=10^6 degenerates to plain BFS rounds; p=0 keeps only seeds") {
    val all = run(chain, Seq(1L), 1000000L, 3)
    assert(all == Map(1L -> 0L, 2L -> 1L, 5L -> 1L, 3L -> 2L, 4L -> 2L,
      6L -> 2L))
    assert(run(chain, Seq(1L), 0L, 3) == Map(1L -> 0L))
  }

  test("cascadeReach counts per-seed live reach, seeds independent") {
    val got = Graph.cascadeReach(chain.toDF("src", "dst"),
        Seq(1L, 4L).toDF("node"), 1000000L, 3)
      .as[(Long, Long)].collect().toMap
    // p=10^6: from 1 everything within 3 hops (all 6 nodes); from 4 the
    // forward chain reaches only 6
    assert(got == Map(1L -> 6L, 4L -> 2L))
  }

  test("greedy step: marginals are union gains, best seed's is zero") {
    val got = Graph.influenceGreedyStep(chain.toDF("src", "dst"),
        Seq(1L, 4L).toDF("node"), 1000000L, 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // reach(1) = {1,2,5,3,4,6} (6), reach(4) = {4,6} (2): best = 1
    assert(got(1L) == ((6L, 6L, 0L)))
    // union(4) = reach(1) ∪ {4,6} = 6 nodes → marginal 0 (subset)
    assert(got(4L) == ((6L, 6L, 0L)))
    // a disjoint candidate adds its own reach
    val got2 = Graph.influenceGreedyStep(
        (chain ++ Seq((100L, 101L, 0L)).map(t => (t._1, t._2)))
          .toDF("src", "dst"),
        Seq(1L, 100L).toDF("node"), 1000000L, 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got2(100L)._3 == got2(100L)._2 - got2(100L)._1)
    assert(got2(100L)._3 == 2L) // {100, 101} joins the best set
  }

  test("the coin is per-DIRECTED-edge: reverse edges flip independently") {
    // find a probability where exactly one direction of (7,8) is live
    val p = 500000L
    val fwd = h48("7:8") % 1000000L < p
    val bwd = h48("8:7") % 1000000L < p
    assume(fwd != bwd) // holds for this fixed hash pair
    val e = Seq((7L, 8L), (8L, 7L))
    val fromSeven = run(e, Seq(7L), p, 1).contains(8L)
    val fromEight = run(e, Seq(8L), p, 1).contains(7L)
    assert(fromSeven == fwd && fromEight == bwd)
  }
}
