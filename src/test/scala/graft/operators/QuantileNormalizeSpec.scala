package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class QuantileNormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)]): Map[Long, Long] =
    Ranking.quantileNormalize(rows.toDF("id", "src", "v"),
        Seq("src"), col("v"), col("id"))
      .select(col("id"), col("norm")).as[(Long, Long)].collect().toMap

  /** Type-1 reference: within-src rank r of n → pooled value at
    * ⌈r·N/n⌉ over the pooled (v, id) order.
    */
  private def ref(rows: Seq[(Long, String, Long)]): Map[Long, Long] = {
    val pooled = rows.sortBy(r => (r._3, r._1)).map(_._3).toVector
    val n = pooled.size.toLong
    rows.groupBy(_._2).flatMap { case (_, grp) =>
      val order = grp.sortBy(r => (r._3, r._1))
      order.zipWithIndex.map { case (row, i) =>
        val r = i + 1L
        val idx = (r * n + grp.size - 1) / grp.size
        row._1 -> pooled((idx - 1).toInt)
      }
    }
  }

  test("maps each source onto the pooled distribution, type-1 exact") {
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 100L), (5L, "b", 200L),
      (6L, "c", 15L))
    assert(run(rows) == ref(rows))
  }

  test("a single-source input is the identity on its own values") {
    val rows = Seq((1L, "a", 5L), (2L, "a", 9L), (3L, "a", 7L))
    val got = run(rows)
    assert(got == Map(1L -> 5L, 2L -> 9L, 3L -> 7L))
  }

  test("ties broken by id keep both engines on one total order") {
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "b", 10L), (4L, "b", 40L))
    assert(run(rows) == ref(rows))
  }
}
