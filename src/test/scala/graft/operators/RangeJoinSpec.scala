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

  test("overlap join equals the naive non-equi join, each pair exactly once") {
    // intervals spanning multiple buckets (w=5), touching endpoints, nested
    val a = Seq((1L, 0.0, 12.0), (2L, 10.0, 11.0), (3L, 20.0, 30.0))
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 11.9, 25.0), (20L, 12.0, 13.0), (30L, 2.0, 3.0))
      .toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.overlapJoin(a, col("a_lo"), col("a_hi"),
        b, col("b_lo"), col("b_hi"), 5.0)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    val naive = a.join(b, col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == naive.sorted)
    assert(got.size == got.toSet.size, "no pair may be emitted twice")
    // half-open semantics: [0,12) does not overlap [12,13)
    assert(!got.contains((1L, 20L)) && got.contains((1L, 10L)))
  }

  test("empty intervals overlap nothing, even strictly inside a fat one") {
    val a = Seq((1L, 5.0, 5.0), (2L, 3.0, 4.0)).toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 0.0, 10.0), (20L, 7.0, 7.0)).toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.overlapJoin(a, col("a_lo"), col("a_hi"),
        b, col("b_lo"), col("b_hi"), 5.0)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    // [5,5) and [7,7) are empty sets of points — no pair involving them
    assert(got == Set((2L, 10L)))
  }

  test("overlap join: randomized equivalence with naive join (emit-once property)") {
    val rnd = new scala.util.Random(7)
    def intervals(n: Int, idBase: Long) = (0 until n).map { i =>
      val lo = rnd.nextDouble() * 100
      (idBase + i, lo, lo + rnd.nextDouble() * 25)
    }
    val a = intervals(60, 0L).toDF("aid", "a_lo", "a_hi")
    val b = intervals(60, 1000L).toDF("bid", "b_lo", "b_hi")
    for (w <- Seq(3.0, 10.0, 50.0)) {
      val got = RangeJoin.overlapJoin(a, col("a_lo"), col("a_hi"),
          b, col("b_lo"), col("b_hi"), w)
        .select("aid", "bid").as[(Long, Long)].collect().toSeq
      val naive = a.join(b, col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
        .select("aid", "bid").as[(Long, Long)].collect().toSeq
      assert(got.sorted == naive.sorted, s"w=$w")
    }
  }
}
