package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** r12: hub-safe truss support — the verdict's scale hazard ("a
  * 10⁶-degree hub makes a 10⁶-element array row on every support
  * refresh"). Pins (a) exact supports on a synthetic 10k-degree hub
  * with the HUB strategy engaged, and (b) strategy agreement: the
  * hub-safe row path and the hub-free array path compute identical
  * k-truss results on the same graph.
  */
class TrussHubSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // hub 0 → spokes 1..10000, chain i—(i+1) for i = 1..2000:
  // triangles {0, i, i+1} for i = 1..2000. Analytic supports:
  //   (0,1) and (0,2001) → 1;  (0,i) for 2 ≤ i ≤ 2000 → 2;
  //   chain (i,i+1) → 1;  spokes (0,j) for j ≥ 2002 → 0.
  private def hubGraph = {
    val spokes = (1 to 10000).map(j => (0L, j.toLong))
    val chain = (1 to 2000).map(i => (i.toLong, (i + 1).toLong))
    (spokes ++ chain).toDF("src", "dst")
  }

  private def withHubThreshold[A](t: Long)(body: => A): A = {
    val key = "spark.graft.graph.hubDegree"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, t.toString)
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("10k-degree hub: exact supports under the hub strategy") {
    withHubThreshold(1000) { // hub 0 (degree 10000) takes the row path
      val res = Graph.kTruss(hubGraph, k = 3, rounds = 5)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        .toMap
      // 3-truss fixpoint: the zero-support spokes (j ≥ 2002) peel, no
      // triangle is destroyed, everything else stays
      assert(res.size == 2001 + 2000, s"edges kept: ${res.size}")
      assert(res((0L, 1L)) == 1L && res((0L, 2001L)) == 1L)
      assert(res((0L, 2L)) == 2L && res((0L, 1000L)) == 2L &&
        res((0L, 2000L)) == 2L)
      assert(res((1L, 2L)) == 1L && res((500L, 501L)) == 1L)
      assert(!res.contains((0L, 2002L)) && !res.contains((0L, 10000L)))
    }
  }

  test("hub strategy and hub-free strategy agree exactly") {
    val hub = withHubThreshold(1000) {
      Graph.kTruss(hubGraph, k = 3, rounds = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val free = withHubThreshold(1000000) {
      Graph.kTruss(hubGraph, k = 3, rounds = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(hub == free)
    // and the cascading case: k=4 peels the whole graph either way
    val hub4 = withHubThreshold(1000) {
      Graph.kTruss(hubGraph, k = 4, rounds = 10).count()
    }
    val free4 = withHubThreshold(1000000) {
      Graph.kTruss(hubGraph, k = 4, rounds = 10).count()
    }
    assert(hub4 == 0L && free4 == 0L)
  }

  test("trussness labels agree across strategies on the hub graph") {
    def labels(t: Long) = withHubThreshold(t) {
      Graph.trussness(hubGraph, maxK = 4, roundsPerLevel = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val hub = labels(1000)
    val free = labels(1000000)
    assert(hub == free)
    // triangle edges are 3-trusses, bare spokes stay at 2
    assert(hub.contains((0L, 2L, 3L)) && hub.contains((1L, 2L, 3L)))
    assert(hub.contains((0L, 9999L, 2L)))
  }
}
