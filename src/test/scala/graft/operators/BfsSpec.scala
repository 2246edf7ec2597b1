package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class BfsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hops(edges: Seq[(Long, Long)], seeds: Seq[Long],
                   rounds: Int): Map[Long, Long] =
    Graph.bfsHops(edges.toDF("src", "dst"), seeds.toDF("node"), rounds)
      .as[(Long, Long)].collect().toMap

  private val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))

  test("hop labels relax one ring per round; the horizon is `rounds`") {
    assert(hops(path, Seq(1L), rounds = 2) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // rounds >= eccentricity == true distances
    assert(hops(path, Seq(1L), rounds = 4) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    assert(hops(path, Seq(1L), rounds = 6) ==
      hops(path, Seq(1L), rounds = 4), "past convergence is a no-op")
  }

  test("multi-source takes the minimum over seeds") {
    assert(hops(path, Seq(1L, 5L), rounds = 2) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 5L -> 0L, 4L -> 1L))
  }

  test("edges are canonicalized; an off-graph seed reports itself only") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (2L, 2L))
    assert(hops(messy, Seq(1L), rounds = 2) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    assert(hops(path, Seq(99L), rounds = 2) == Map(99L -> 0L))
  }
}
