package graft.streaming

import graft.SparkTestSession
import graft.sketches.Kmv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamDayKmvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3 days, overlapping users; k small (4) so the sketch actually bounds
  private val k = 4
  private val rows = Seq(
    (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L), (0L, 6L),
    (1L, 4L), (1L, 5L), (1L, 6L), (1L, 7L),
    (2L, 1L), (2L, 8L), (2L, 8L) // duplicate arrival within a day
  ).toDF("day", "user")

  private def hashed = rows.select(col("day"),
    Kmv.hash48(col("user")).as("h"))

  test("drained day sketches equal the batch per-day KMV sketch") {
    val streamed = Streams.streamingDayKmv(spark, hashed, k,
        queryName = s"t_sdaykmv_${System.nanoTime()}")
      .select(col("day"), col("sk"))
      .as[(Long, Array[Long])].collect().map(r => r._1 -> r._2.toSeq).toMap
    val batch = hashed.groupBy("day").agg(Kmv.kmvSketch(col("h"), k).as("sk"))
      .as[(Long, Array[Long])].collect().map(r => r._1 -> r._2.toSeq).toMap
    assert(streamed == batch)
    assert(streamed(0L).size == k, "day 0 has 6 distinct users, sketch caps at k")
    assert(streamed(1L).size == k)
    assert(streamed(2L).size == 2, "duplicate arrivals insert once")
  }

  test("merged day sketches equal the sketch of the union (KMV merge law)") {
    val streamed = Streams.streamingDayKmv(spark, hashed, k,
        queryName = s"t_sdaykmv_${System.nanoTime()}")
    val mergedEst = streamed
      .select(explode(col("sk")).as("h"))
      .agg(Kmv.kmvDistinct(col("h"), k).as("est"))
      .as[Long].head()
    val directEst = hashed.agg(Kmv.kmvDistinct(col("h"), k).as("est"))
      .as[Long].head()
    assert(mergedEst == directEst,
      "estimate from merged per-day sketches must equal the all-data sketch")
  }
}
