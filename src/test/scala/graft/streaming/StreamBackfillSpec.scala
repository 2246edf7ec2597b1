package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** X26: streaming backfill-gap monitor ≡ the batch C28 planner. */
class StreamBackfillSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // type a: hours 10..15 with 12, 13 missing; type b: contiguous 5..7;
  // type c: single hour (span 1, no gaps)
  private val rows: Seq[(String, Long)] =
    Seq("a" -> 10L, "a" -> 11L, "a" -> 14L, "a" -> 15L, "a" -> 10L,
      "b" -> 5L, "b" -> 6L, "b" -> 7L, "c" -> 99L)

  test("gap report equals the batch planner, both state backends") {
    for (rocks <- Seq(false, true)) {
      val got = Streams.streamingBackfillGaps(spark,
          rows.toDF("event_type", "hr"),
          queryName = s"sbackfill_spec_$rocks", rocksDb = rocks)
        .orderBy("event_type")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      // only type a has gaps: span 6, missing 12..13
      assert(got == Seq(("a", 6L, 2L, 12L, 13L)), s"rocksDb=$rocks")
    }
  }

  test("a late hour closes its gap (state is re-derived, not monotone)") {
    val closed = rows ++ Seq("a" -> 12L, "a" -> 13L)
    val got = Streams.streamingBackfillGaps(spark,
        closed.toDF("event_type", "hr"), queryName = "sbackfill_spec_closed")
      .collect()
    assert(got.isEmpty, "all gaps closed -> no rows, like the batch planner")
  }
}
