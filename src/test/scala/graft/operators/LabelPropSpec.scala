package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class LabelPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Two 4-cliques joined by one bridge edge (4-5): communities {1..4}, {5..8}
  private val twoCliques = (
    (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)) ++
    (for { a <- 5L to 8L; b <- (a + 1) to 8L } yield (a, b)) ++
    Seq((4L, 5L))
  ).toDF("src", "dst")

  /** Straight-line synchronous LPA with the documented tie rule. */
  private def reference(adj: Map[Long, Seq[Long]], iters: Int): Map[Long, Long] = {
    var lbl = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lbl = adj.map { case (v, nbrs) =>
        val hist = nbrs.groupBy(lbl).view.mapValues(_.size)
        v -> hist.toSeq.maxBy { case (l, n) => (n.toLong, -l) }._1
      }
    }
    lbl
  }

  private def adjOf(edges: Seq[(Long, Long)]): Map[Long, Seq[Long]] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  test("3 rounds match the synchronous reference and find both cliques") {
    val got = Graph.labelPropagation(twoCliques, 3)
      .as[(Long, Long)].collect().toMap
    val edges = twoCliques.as[(Long, Long)].collect().toSeq
    assert(got == reference(adjOf(edges), 3))
    // within each clique all labels agree (bridge nodes may defect, but
    // interior nodes of a 4-clique cannot)
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(Set(got(6L), got(7L), got(8L)).size == 1)
    assert(got(1L) != got(8L), "the two cliques must keep distinct labels")
  }

  test("tie-break picks the smallest label deterministically") {
    // path 1-2-3: node 2's neighbors {1,3} tie at count 1 → label 1
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r1 = Graph.labelPropagation(path, 1).as[(Long, Long)].collect().toMap
    assert(r1(2L) == 1L)
    assert(r1(1L) == 2L, "node 1's only neighbor is 2")
    assert(r1(3L) == 2L)
  }

  test("iteration count is respected (round 2 differs from round 1 on a path)") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val edges = path.as[(Long, Long)].collect().toSeq
    for (i <- 1 to 3) {
      val got = Graph.labelPropagation(path, i).as[(Long, Long)].collect().toMap
      assert(got == reference(adjOf(edges), i), s"round $i diverged")
    }
  }
}
