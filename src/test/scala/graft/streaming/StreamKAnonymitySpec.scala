package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X24: streaming k-anonymity monitor ≡ the batch Q3 screen. */
class StreamKAnonymitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (event_type, day, user_id) with repeats: group sizes 1, 2, and 5
  private val rows = Seq(
    ("click", 1L, 10L), ("click", 1L, 10L), ("click", 1L, 11L),
    ("click", 2L, 10L), ("click", 2L, 11L), ("click", 2L, 12L),
    ("click", 2L, 13L), ("click", 2L, 14L),
    ("view", 1L, 20L),
    ("view", 3L, 20L), ("view", 3L, 21L), ("view", 3L, 20L))

  private def batchReport(k: Int) =
    rows.toDF("event_type", "day", "user_id")
      .groupBy(col("event_type"), col("day"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_users") < k, 1L).otherwise(0L)).as("n_risky_groups"),
        min(col("n_users")).as("min_group_users"))
      .orderBy(col("event_type"))
      .as[(String, Long, Long, Long)].collect().toSeq

  test("streamed monitor equals the batch screen, both state backends") {
    for (rocks <- Seq(false, true)) {
      val got = Streams.streamingKAnonymity(spark,
          rows.toDF("event_type", "day", "user_id"), k = 5,
          queryName = s"skanon_spec_$rocks", rocksDb = rocks)
        .orderBy(col("event_type"))
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got == batchReport(5), s"rocksDb=$rocks")
    }
  }

  test("risky-group accounting is exact at the boundary") {
    val got = Streams.streamingKAnonymity(spark,
        rows.toDF("event_type", "day", "user_id"), k = 2,
        queryName = "skanon_spec_k2")
      .orderBy(col("event_type"))
      .as[(String, Long, Long, Long)].collect().toMap2
    // click groups: {1:2 users, 2:5} -> none below 2; view: {1:1, 3:2} -> one
    assert(got("click") == (2L, 0L, 2L))
    assert(got("view") == (2L, 1L, 1L))
  }

  private implicit class MapOps(rows: Array[(String, Long, Long, Long)]) {
    def toMap2: Map[String, (Long, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
