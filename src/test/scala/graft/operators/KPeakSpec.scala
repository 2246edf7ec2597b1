package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** R103: k-peak decomposition. */
class KPeakSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def peaks(edges: Seq[(Long, Long)], contours: Int = 3,
                    maxK: Int = 4): Map[Long, Long] =
    Graph.kPeak(edges.toDF("src", "dst"), maxK, roundsPerLevel = 30,
        maxContours = contours)
      .as[(Long, Long)].collect().toMap

  private val k5 = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)

  test("foothill: coreness borrowed from the core's mass, peak reveals it") {
    // p1 touches two K5 nodes -> coreness 2; but once the K5 contour is
    // peeled, p1 sits on a bare path -> peak 1. The case coreness alone
    // cannot distinguish from a genuine 2-dense neighborhood.
    val g = k5 ++ Seq((1L, 11L), (2L, 11L), (11L, 12L), (12L, 13L))
    val cor = Graph.coreness(g.toDF("src", "dst"), 4, 30)
      .as[(Long, Long)].collect().toMap
    assert(cor(11L) == 2L, "sanity: coreness sees p1 as 2-dense")
    val got = peaks(g)
    assert((1L to 5L).forall(got(_) == 4L), "the K5 is the first contour")
    assert(got(11L) == 1L && got(12L) == 1L && got(13L) == 1L,
      "the hanging path is foothill: peak 1")
  }

  test("two equal mountains land in the same contour") {
    val k5b = k5.map { case (a, b) => (a + 10L, b + 10L) }
    val got = peaks(k5 ++ k5b)
    assert(got.values.toSet == Set(4L) && got.size == 10)
  }

  test("maxContours truncates: unpeeled nodes stay unlabeled") {
    val g = k5 ++ Seq((1L, 11L), (2L, 11L), (11L, 12L), (12L, 13L))
    val got = peaks(g, contours = 1)
    assert(got.keySet == (1L to 5L).toSet, "only the first contour labeled")
  }

  test("empty graph labels nothing") {
    assert(peaks(Seq.empty).isEmpty)
  }
}
