package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RandomWalksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))

  private def run(steps: Int): Map[Long, String] =
    Graph.randomWalks(edges.toDF("src", "dst"),
        Seq(1L, 3L).toDF("node"), steps)
      .as[(Long, String)].collect().toMap

  test("walks are deterministic, fixed-length, and edge-respecting") {
    val got = run(4)
    assert(got == run(4), "replay must be bit-identical")
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    got.foreach { case (seed, path) =>
      val nodes = path.split("->").map(_.toLong).toSeq
      assert(nodes.length == 5, s"4 steps = 5 nodes, got $path")
      assert(nodes.head == seed)
      nodes.sliding(2).foreach { case Seq(u, v) =>
        assert(adj(u).contains(v), s"non-edge $u->$v in $path")
      }
    }
  }

  test("an isolated seed absorbs: the walk keeps appending the node") {
    val got = Graph.randomWalks(edges.toDF("src", "dst"),
        Seq(99L).toDF("node"), steps = 3)
      .as[(Long, String)].collect().toMap
    assert(got(99L) == "99->99->99->99")
  }

  test("longer prefixes extend shorter ones (hash keyed by step)") {
    val w2 = run(2)
    val w4 = run(4)
    w2.foreach { case (seed, p2) =>
      assert(w4(seed).startsWith(p2), s"$p2 not a prefix of ${w4(seed)}")
    }
  }
}
