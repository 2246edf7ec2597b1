package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class InterpolateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)]): Map[(Long, Long), (Option[Long], Long)] =
    Resample.interpolate(rows.toDF("k", "b", "v"),
        col("k"), col("b"), col("v"))
      .as[(Long, Long, Option[Long], Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("gap buckets interpolate linearly with truncating division") {
    // anchors (0, 10) and (4, 21): slope 11/4 → 10, 12, 15, 18, 21
    val got = run(Seq((1L, 0L, 10L), (1L, 4L, 21L)))
    assert(got.view.mapValues(_._2).toMap == Map(
      (1L, 0L) -> 10L, (1L, 1L) -> 12L, (1L, 2L) -> 15L,
      (1L, 3L) -> 18L, (1L, 4L) -> 21L))
    assert(got((1L, 2L))._1.isEmpty && got((1L, 0L))._1.contains(10L))
  }

  test("downward slopes use the sign-carried (trunc) division") {
    // anchors (0, 0) and (3, -7): exact thirds trunc toward zero
    val got = run(Seq((1L, 0L, 0L), (1L, 3L, -7L)))
    assert(got.view.mapValues(_._2).toMap == Map(
      (1L, 0L) -> 0L, (1L, 1L) -> -2L, (1L, 2L) -> -4L, (1L, 3L) -> -7L))
  }

  test("observed buckets keep their value; keys are independent") {
    val got = run(Seq((1L, 0L, 5L), (1L, 1L, 100L), (1L, 2L, 6L),
      (2L, 10L, 3L)))
    assert(got((1L, 1L))._2 == 100L)
    assert(got((2L, 10L)) == ((Some(3L), 3L)))
    assert(got.size == 4)
  }
}
