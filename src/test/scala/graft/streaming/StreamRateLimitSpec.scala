package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class StreamRateLimitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("appended decisions equal the batch token-bucket replay") {
    val rows = Seq(
      (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 3L), (1L, 5L, 900L),
      (2L, 6L, 0L), (2L, 7L, 0L))
      .toDF("key", "id", "ts_sec")
    val got = Streams.streamingRateLimit(spark, rows,
        capMilli = 3000L, refillMilli = 2L, costMilli = 1000L,
        queryName = "sratelimit_test")
      .as[(Long, Long, Long, Boolean, Long)].collect().toSet
    val want = graft.operators.RateLimit.tokenBucket(rows,
        col("key"), col("id"), col("ts_sec"), 3000L, 2L, 1000L)
      .as[(Long, Long, Long, Boolean, Long)].collect().toSet
    assert(got == want)
    // sanity: the burst rejects the 4th event, the 900s gap readmits
    val k1 = got.filter(_._1 == 1L).toSeq.sortBy(_._2).map(_._4)
    assert(k1 == Seq(true, true, true, false, true))
  }
}
