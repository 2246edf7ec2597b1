package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class StreamSpatialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streamed in-radius pairs equal the batch brute force") {
    val pts = Seq((1L, 0L, 0L), (2L, 9L, 0L), (3L, 95L, 95L),
      (4L, 300L, 300L), (5L, 11L, 11L))
    val ref = Seq((10L, 5L, 5L), (11L, 100L, 100L))
    val got = Streams.streamingSpatialEnrich(spark,
        pts.toDF("id", "x", "y"), ref.toDF("id", "x", "y"), r = 10L,
        queryName = "sspatial_test")
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      p <- pts; q <- ref
      d = (p._2 - q._2) * (p._2 - q._2) + (p._3 - q._3) * (p._3 - q._3)
      if d <= 100L
    } yield (p._1, q._1, d)).toSet
    assert(got == want)
    assert(want.nonEmpty)                  // fixture sanity: pairs exist
    assert(got.contains((3L, 11L, 50L)))   // cross-cell diagonal pair
  }
}
