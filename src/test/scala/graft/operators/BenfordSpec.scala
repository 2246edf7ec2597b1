package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Q5: Benford first-digit screen. */
class BenfordSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(vals: Seq[Double]): Seq[(Long, Long, Long, Long, Long)] =
    Quality.benford(vals.toDF("v"), col("v"))
      .orderBy("digit")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("first significant digit of the integer part, 9 rows always") {
    val got = run(Seq(1.5, 19.0, 123.0, 2.0, 900.0, 9999.0))
    assert(got.size == 9)
    val byDigit = got.map(r => r._1 -> r._2).toMap
    assert(byDigit == Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 0L,
      6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 2L))
  }

  test("values below 1 are excluded") {
    val got = run(Seq(0.5, 0.09, 3.0))
    assert(got.map(_._2).sum == 1L, "only the 3.0 counts")
  }

  test("obs_ppm is exact and sums within truncation of 1e6") {
    val got = run(Seq(1.0, 1.0, 2.0))
    val ppm = got.map(r => r._1 -> r._3).toMap
    assert(ppm(1L) == 666666L && ppm(2L) == 333333L)
  }

  test("expected ppm constants are the precomputed Benford table") {
    val got = run(Seq(1.0))
    assert(got.map(_._4) == Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L))
    assert(got.map(_._4).sum == 999995L, "floor truncation leaves 5 ppm")
  }

  test("empty input reports zeros, not nulls or divide-by-zero") {
    val got = run(Seq.empty)
    assert(got.size == 9 && got.forall(r => r._2 == 0L && r._3 == 0L))
  }
}
