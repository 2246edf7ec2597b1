package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** R139 HITS + R140 link prediction. */
class HitsLinkPredictSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def runHits(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Option[Long], Option[Long])] =
    Graph.hits(edges.toDF("src", "dst"), iters)
      .as[(Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("HITS: two-hub two-authority hand case, two rounds") {
    // h1 -> {a1, a2}, h2 -> {a1}; node ids disjoint by construction
    val got = runHits(Seq((1L, 11L), (1L, 12L), (2L, 11L)), 2)
    // round 1: a(a1)=2e6 -> 1e6, a(a2)=1e6 -> 500000
    //          h(h1)=1.5e6 -> 1e6, h(h2)=1e6 -> 666666
    // round 2: a(a1)=1666666 -> 1e6, a(a2)=1e6 -> 600000
    //          h(h1)=1600000 -> 1e6, h(h2)=1e6 -> 625000
    assert(got(1L) == ((Some(1000000L), None)))
    assert(got(2L) == ((Some(625000L), None)))
    assert(got(11L) == ((None, Some(1000000L))))
    assert(got(12L) == ((None, Some(600000L))))
  }

  test("HITS: a directed cycle is score-uniform at 1e6") {
    val got = runHits(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 3)
    assert(got.values.forall(_ == ((Some(1000000L), Some(1000000L)))))
  }

  test("HITS: duplicate edges dedupe; pure sink has no hub score") {
    val got = runHits(Seq((1L, 2L), (1L, 2L), (3L, 2L)), 1)
    assert(got(2L)._1.isEmpty, "sink has no out-edges")
    assert(got(2L)._2.contains(1000000L))
    assert(got(1L) == ((Some(1000000L), None)))
    assert(got(3L) == ((Some(1000000L), None)))
  }

  private def runLp(edges: Seq[(Long, Long)], minCommon: Long)
      : Map[(Long, Long), (Long, Long, Long, Long)] =
    Graph.linkPredictJaccard(edges.toDF("src", "dst"), minCommon)
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

  test("link prediction: square predicts both diagonals at 1e6") {
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val got = runLp(sq, 2L)
    assert(got.keySet == Set((1L, 3L), (2L, 4L)))
    assert(got((1L, 3L)) == ((2L, 2L, 2L, 1000000L)))
    assert(got((2L, 4L)) == ((2L, 2L, 2L, 1000000L)))
  }

  test("link prediction: triangle (all adjacent) predicts nothing") {
    assert(runLp(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 1L).isEmpty)
  }

  test("link prediction: minCommon prunes star leaf pairs") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    assert(runLp(star, 2L).isEmpty)
    val loose = runLp(star, 1L)
    assert(loose.keySet == Set((2L, 3L), (2L, 4L), (3L, 4L)))
    assert(loose.values.forall(_ == ((1L, 1L, 1L, 1000000L))))
  }

  test("link prediction: partial overlap floors the jaccard") {
    // u=1 and v=2 share {3, 4}; 1 also ~ 5, 2 also ~ 6 -> deg 3 each
    val e = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (1L, 5L), (2L, 6L))
    val got = runLp(e, 2L)
    assert(got((1L, 2L)) == ((2L, 3L, 3L, 500000L))) // 2e6 div 4
  }

  test("link prediction: the hub cap drops high-degree wedge centers") {
    // 1 and 2 share centers 3 (deg 2) and 4 (deg 4, a hub): capped at 3
    // only center 3 counts, but the jaccard denominator keeps FULL degs
    val e = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L),
      (4L, 5L), (4L, 6L))
    val full = Graph.linkPredictJaccard(e.toDF("src", "dst"), 1L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(full((1L, 2L))._1 == 2L)
    val capped = Graph.linkPredictJaccard(e.toDF("src", "dst"), 1L,
        maxCenterDegree = 3L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // common drops to 1 (hub 4 suppressed); deg_u/deg_v stay 2 and 2
    assert(capped((1L, 2L)) == ((1L, 2L, 2L, 333333L))) // 1e6 div 3
    // pairs mediated ONLY by the hub disappear entirely
    assert(full.contains((5L, 6L)) && !capped.contains((5L, 6L)))
  }
}
