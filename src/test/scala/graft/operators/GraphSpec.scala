package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): (Long, Long, Long) =
    Graph.triangleCount(edges.toDF("src", "dst"))
      .as[(Long, Long, Long)].collect().head

  test("counts the triangles of known graphs") {
    // K4 has C(4,3) = 4 triangles
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(count(k4) == ((4L, 6L, 4L)))
    // a 4-cycle has none
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == ((4L, 4L, 0L)))
    // two triangles sharing an edge
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)))
      == ((4L, 5L, 2L)))
  }

  test("canonicalizes duplicates, reversed edges, and self-loops") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(count(messy) == ((3L, 3L, 1L)))
  }

  test("a star (hub of high degree) has no triangles and no wedge blowup") {
    val star = (2L to 40L).map(i => (1L, i))
    assert(count(star) == ((40L, 39L, 0L)))
  }

  test("empty edge set yields a zero report, not an empty frame") {
    val (n, m, t) = count(Seq.empty)
    assert(n == 0L && m == 0L && t == 0L)
  }
}
