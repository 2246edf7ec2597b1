package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class AdstockSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(xs: Seq[Long], lambdaPpm: Long): Seq[Long] =
    Changepoint.adstock(
        xs.zipWithIndex.map { case (v, i) => (1L, i.toLong, i.toLong, v) }
          .toDF("k", "id", "ts", "v"),
        col("k"), col("id"), col("ts"), col("v"), lambdaPpm)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._3).map(_._5)

  test("carryover stacks spikes — matches the reference walk") {
    val xs = Seq(10L, 0L, 0L, 10L, 10L)
    val got = run(xs, 500000L)
    assert(got == Changepoint.adstockRef(xs, 500000L))
    // 10000, 5000, 2500, 11250, 15625: the close pair stacks
    assert(got == Seq(10000L, 5000L, 2500L, 11250L, 15625L))
  }

  test("lambda 0 is the identity in milli; decay floors per step") {
    assert(run(Seq(3L, 7L), 0L) == Seq(3000L, 7000L))
    // floor visible: a2 = 0 + 333333·1000/10^6 = 333 (not 333.333)
    assert(run(Seq(1L, 0L), 333333L) == Seq(1000L, 333L))
  }
}
