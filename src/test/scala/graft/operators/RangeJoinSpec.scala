package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val ranges = Seq((0L, 0.0, 10.0), (1L, 10.0, 10.5), (2L, 10.5, 100.0))
    .toDF("band_id", "lo", "hi")
  // boundary rows: exactly lo (in), exactly hi (out, next band's lo)
  val fact = Seq(0.0, 5.0, 9.999, 10.0, 10.4999, 10.5, 99.999).toDF("v")

  test("bucketed band join equals the naive non-equi join, incl. boundaries") {
    val got = RangeJoin.bandJoin(fact, col("v"), ranges, col("lo"), col("hi"), 7.0)
      .select(col("v"), col("band_id")).as[(Double, Long)].collect().toSet
    val naive = fact.join(ranges, col("v") >= col("lo") && col("v") < col("hi"))
      .select(col("v"), col("band_id")).as[(Double, Long)].collect().toSet
    assert(got == naive)
    assert(got((10.0, 1L)) && got((10.5, 2L)) && !got.exists(_ == (10.5, 1L)))
  }

  test("values outside every range drop out") {
    val out = Seq(-1.0, 100.0, 1e9).toDF("v")
    assert(RangeJoin.bandJoin(out, col("v"), ranges, col("lo"), col("hi"), 7.0).count() == 0)
  }
}
