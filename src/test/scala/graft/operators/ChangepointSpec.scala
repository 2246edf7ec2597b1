package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ChangepointSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def runCusum(xs: Seq[Long], k: Long): Seq[Long] = {
    val df = xs.zipWithIndex.map { case (x, i) => ("s", i.toLong, x) }
      .toDF("key", "t", "x")
    Changepoint.cusum(df, Seq("key"), "t", col("x"), lit(k))
      .orderBy(col("t")).select(col("s")).as[Long].collect().toSeq
  }

  test("closed form over prefix sums equals the direct recursion") {
    val cases = Seq(
      (Seq(5L, 5L, 5L), 5L),                    // flat at target -> all 0
      (Seq(10L, 0L, 10L, 0L), 5L),              // oscillating
      (Seq(0L, 0L, 100L, 100L, 0L), 10L),       // burst then recovery
      (Seq(1L, 2L, 3L, 4L, 5L, 50L), 3L),       // drift up
      (Seq(-5L, -5L, 20L), 0L),                 // negative inputs
      (Seq(7L), 3L))                            // singleton
    cases.foreach { case (xs, k) =>
      assert(runCusum(xs, k) == Changepoint.cusumRef(xs, k),
        s"closed form diverged from recursion on xs=$xs k=$k")
    }
  }

  test("statistic is non-negative and resets after deficits") {
    val got = runCusum(Seq(0L, 0L, 0L, 100L), 10L)
    assert(got.forall(_ >= 0L))
    assert(got.take(3) == Seq(0L, 0L, 0L), "below-target prefix stays at zero")
    assert(got(3) == 90L, "the burst registers immediately, undiluted by the deficit")
  }

  test("keys are independent series") {
    val df = Seq(("a", 0L, 100L), ("a", 1L, 100L), ("b", 0L, 0L), ("b", 1L, 0L))
      .toDF("key", "t", "x")
    val got = Changepoint.cusum(df, Seq("key"), "t", col("x"), lit(10L))
      .select(col("key"), col("t"), col("s")).as[(String, Long, Long)]
      .collect().map { case (k, t, s) => (k, t) -> s }.toMap
    assert(got(("a", 1L)) == 180L && got(("b", 1L)) == 0L)
  }
}
