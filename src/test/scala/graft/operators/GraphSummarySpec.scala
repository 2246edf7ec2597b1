package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSummarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("summary counts nodes/edges/degrees/components on a two-component graph") {
    // triangle {1,2,3} + edge {10,11}; reversed dup and self-loop absorbed
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (2L, 1L), (5L, 5L))
      .toDF("src", "dst")
    val r = Graph.summary(edges)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((5L, 4L, 2L, 1L, 4L * 2 * 1000000 / 5, 2L, 3L)))
  }

  test("weighted PageRank follows the integer recurrence with weights") {
    // star: center 1 with leaves 2,3; edge (1,2) weight 3, (1,3) weight 1
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    // strength: 1→4, 2→3, 3→1
    // round 1: shares into 2: pr1*3 div 4 = 750000; into 3: 250000;
    //          into 1: from 2: 1e6*3 div 3 = 1e6; from 3: 1e6*1 div 1 = 1e6
    // pr(1) = 150000 + 850000*2000000 div 1e6 = 1850000
    // pr(2) = 150000 + 850000*750000 div 1e6 = 787500
    // pr(3) = 150000 + 850000*250000 div 1e6 = 362500
    val got = Graph.pageRankWeighted(edges, 1).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1850000L, 2L -> 787500L, 3L -> 362500L))
    // heavier edge pulls more rank at equal topology
    assert(got(2L) > got(3L))
  }

  test("clustering coefficient: triangle+tail graph, exact ppm, NULL leaves") {
    // triangle {1,2,3} plus tail 3-4: coeff(1)=coeff(2)=1, coeff(3)=1/3,
    // coeff(4)=NULL (leaf)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.clusteringCoefficient(edges)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 1L, Some(1000000L))))
    assert(got(2L) == ((2L, 1L, Some(1000000L))))
    assert(got(3L) == ((3L, 1L, Some(2L * 1 * 1000000 / (3 * 2)))))
    assert(got(4L) == ((1L, 0L, None)), "leaf coefficient must be NULL, not 0")
  }

  test("clustering coefficient counts every corner of every triangle") {
    // K4: every node has deg 3 and sits in C(3,2)=3 triangles → coeff 1
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b))
      .toDF("src", "dst")
    val got = Graph.clusteringCoefficient(k4)
      .as[(Long, Long, Long, Option[Long])].collect()
    assert(got.length == 4)
    assert(got.forall(r => r._2 == 3L && r._3 == 3L && r._4.contains(1000000L)))
  }

  test("weighted and unweighted PageRank agree when all weights are equal") {
    val raw = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val unw = Graph.pageRank(raw.toDF("src", "dst"), 2)
      .as[(Long, Long)].collect().toMap
    val w = Graph.pageRankWeighted(
        raw.map { case (a, b) => (a, b, 7L) }.toDF("src", "dst", "w"), 2)
      .as[(Long, Long)].collect().toMap
    assert(unw == w, "constant weights must reduce to the unweighted ranks")
  }
}
