package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RateLimitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], cap: Long, refill: Long,
                  cost: Long): Seq[(Long, Boolean, Long)] =
    RateLimit.tokenBucket(rows.toDF("k", "id", "ts"),
        col("k"), col("id"), col("ts"), cap, refill, cost)
      .as[(Long, Long, Long, Boolean, Long)].collect().toSeq
      .sortBy(r => (r._1, r._3, r._2)).map(r => (r._2, r._4, r._5))

  test("burst drains the bucket, refill readmits, matches the reference") {
    // cap 3000, cost 1000, refill 10/s: 4 events at t=0..3 then t=500
    val ts = Seq(0L, 1L, 2L, 3L, 500L)
    val rows = ts.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }
    val got = run(rows, 3000L, 10L, 1000L)
    val want = RateLimit.tokenBucketRef(ts, 3000L, 10L, 1000L)
    assert(got.map(r => (r._2, r._3)) == want)
    // 3 admitted, 4th rejected (only 30 milli refilled), 5th readmitted
    assert(got.map(_._2) == Seq(true, true, true, false, true))
  }

  test("refill caps at capacity — a long gap does not overfill") {
    val rows = Seq((1L, 1L, 0L), (1L, 2L, 1000000L))
    val got = run(rows, 2000L, 5L, 1000L)
    assert(got.map(_._3) == Seq(1000L, 1000L)) // capped at 2000 then -1000
  }

  test("keys are independent buckets") {
    val rows = Seq((1L, 1L, 0L), (1L, 2L, 0L), (2L, 3L, 0L))
    val got = run(rows, 1000L, 0L, 1000L)
    // key 1: first admitted, second rejected; key 2: fresh bucket admits
    assert(got == Seq((1L, true, 0L), (2L, false, 0L), (3L, true, 0L)))
  }

  test("equal timestamps order by id deterministically") {
    val ts = Seq(5L, 5L, 5L)
    val rows = ts.zipWithIndex.map { case (t, i) => (7L, i.toLong, t) }
    val got = run(rows, 2500L, 100L, 1000L)
    assert(got.map(r => (r._2, r._3)) ==
      RateLimit.tokenBucketRef(ts, 2500L, 100L, 1000L))
    assert(got.map(_._2) == Seq(true, true, false))
  }
}
