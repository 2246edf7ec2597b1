package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SpatialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pts(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("id", "x", "y")

  /** Brute-force reference: all pairs a<b within r (squared Euclidean). */
  private def refPairs(rows: Seq[(Long, Long, Long)], r: Long) =
    (for {
      a <- rows; b <- rows if a._1 < b._1
      d = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d <= r * r
    } yield (a._1, b._1, d)).toSet

  test("radiusJoin matches brute force, including cross-cell pairs") {
    // points straddling cell borders at r=10: (9,9)-(11,11) cross both axes
    val rows = Seq((1L, 9L, 9L), (2L, 11L, 11L), (3L, 30L, 9L),
      (4L, 31L, 12L), (5L, 200L, 200L), (6L, 9L, 30L))
    val got = Spatial.radiusJoin(pts(rows), col("id"), col("x"), col("y"), 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == refPairs(rows, 10L))
    assert(got.contains((1L, 2L, 8L)))          // diagonal cross-cell pair
  }

  test("radiusJoin emits each pair exactly once (no distinct needed)") {
    val rows = Seq((1L, 5L, 5L), (2L, 6L, 5L), (3L, 5L, 6L))
    val out = Spatial.radiusJoin(pts(rows), col("id"), col("x"), col("y"), 10L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.size == out.distinct.size && out.size == 3)
  }

  test("knnWithinRadius ranks by (dist, id) and honours the radius bound") {
    val corpus = Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 0L, 4L),
      (4L, 3L, 4L), (5L, 100L, 100L))
    val queries = Seq((1L, 0L, 0L))
    val got = Spatial.knnWithinRadius(pts(queries), pts(corpus),
        col("id"), col("x"), col("y"), r = 10L, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // dist: 2→9, 3→16, 4→25; 5 out of radius; self excluded
    assert(got == Seq((1L, 2L, 9L, 1L), (1L, 3L, 16L, 2L), (1L, 4L, 25L, 3L)))
  }

  test("knnWithinRadius returns fewer than k when the radius starves it") {
    val corpus = Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 500L, 0L))
    val got = Spatial.knnWithinRadius(pts(Seq((1L, 0L, 0L))), pts(corpus),
        col("id"), col("x"), col("y"), r = 10L, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 9L, 1L)))
  }

  test("gridDensityCluster merges 8-adjacent dense cells, drops noise") {
    // cell size 10: dense cells (0,0) and (1,1) are diagonal neighbors →
    // one cluster labeled by min cell key; (5,5) dense but isolated →
    // its own cluster; lone point (id 9) is noise
    def cell(gx: Long, gy: Long, base: Long) =
      Seq((base, gx * 10 + 1, gy * 10 + 1), (base + 1, gx * 10 + 2, gy * 10 + 2))
    val rows = cell(0, 0, 1) ++ cell(1, 1, 3) ++ cell(5, 5, 5) ++
      Seq((9L, 80L, 80L))
    val got = Spatial.gridDensityCluster(pts(rows), col("id"), col("x"),
        col("y"), cellSize = 10L, minPts = 2L)
      .as[(Long, Long)].collect().toMap
    val c00 = 0L * 1048576L + 0L
    val c55 = 5L * 1048576L + 5L
    assert(got == Map(1L -> c00, 2L -> c00, 3L -> c00, 4L -> c00,
      5L -> c55, 6L -> c55))
  }

  test("gridDensityCluster with no dense cells returns empty, not error") {
    val rows = Seq((1L, 0L, 0L), (2L, 500L, 500L))
    val got = Spatial.gridDensityCluster(pts(rows), col("id"), col("x"),
        col("y"), cellSize = 10L, minPts = 2L).count()
    assert(got == 0L)
  }
}
