package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** X27: streaming backfill-horizon monitor — bounded bitmap state. */
class StreamBackfillHorizonSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // type a: ancient hours 1-3 (outside any 4h horizon ending at 53),
  //         then 50, 52, 53 — only hour 51 is a WINDOW gap;
  // type b: contiguous 5..7 — no gaps, absent from the report;
  // type c: 10 and 12 with a span shorter than the horizon — window
  //         clamps to loSeen, gap at 11
  private val rows: Seq[(String, Long)] =
    Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "a" -> 50L, "a" -> 52L, "a" -> 53L,
      "b" -> 5L, "b" -> 6L, "b" -> 7L, "c" -> 10L, "c" -> 12L)

  test("only gaps inside the trailing horizon are reported, both backends") {
    for (rocks <- Seq(false, true)) {
      val got = Streams.streamingBackfillHorizon(spark,
          rows.toDF("event_type", "hr"), horizon = 4,
          queryName = s"sbackfillh_spec_$rocks", rocksDb = rocks)
        .orderBy("event_type")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(got == Seq(("a", 4L, 1L, 51L, 51L), ("c", 3L, 1L, 11L, 11L)),
        s"rocksDb=$rocks: a's hours 4..49 are NOT window gaps; c clamps to loSeen")
    }
  }

  test("a late hour closes its window gap") {
    val closed = rows ++ Seq("a" -> 51L, "c" -> 11L)
    val got = Streams.streamingBackfillHorizon(spark,
        closed.toDF("event_type", "hr"), horizon = 4,
        queryName = "sbackfillh_spec_closed")
      .collect()
    assert(got.isEmpty, "all window gaps closed -> no rows")
  }

  test("multi-word horizon: gaps beyond offset 64 are tracked exactly") {
    // horizon 100 needs two bitmap words; hours 0 and 99 observed, the
    // 98 hours between them all missing — offsets 1..98 span the word
    // boundary, and hour 0 (offset 99) must stay PRESENT
    val rows: Seq[(String, Long)] = Seq("w" -> 0L, "w" -> 99L)
    val got = Streams.streamingBackfillHorizon(spark,
        rows.toDF("event_type", "hr"), horizon = 100,
        queryName = "sbackfillh_spec_wide")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("w", 100L, 98L, 1L, 98L)))
  }

  test("multi-word shift carries across the word boundary") {
    // observe 10, then 60 (offset 50), then advance hi to 140: offset of
    // hour 60 becomes 80 — its bit must survive the cross-word shift
    val rows: Seq[(String, Long)] = Seq("c" -> 10L, "c" -> 60L, "c" -> 140L)
    val got = Streams.streamingBackfillHorizon(spark,
        rows.toDF("event_type", "hr"), horizon = 128,
        queryName = "sbackfillh_spec_carry")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // window [13, 140]: observed 60 and 140 -> 126 missing
    assert(got.size == 1)
    val (_, n, miss, first, last) = got.head
    assert(n == 128L && miss == 126L && first == 13L && last == 139L)
  }

  test("matches the unbounded monitor when the horizon covers the span") {
    val dense: Seq[(String, Long)] =
      Seq("x" -> 100L, "x" -> 101L, "x" -> 104L, "x" -> 106L, "y" -> 7L)
    val h = Streams.streamingBackfillHorizon(spark,
        dense.toDF("event_type", "hr"), horizon = 48,
        queryName = "sbackfillh_spec_cover")
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val g = Streams.streamingBackfillGaps(spark,
        dense.toDF("event_type", "hr"), queryName = "sbackfillh_spec_ref")
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(h == g, "horizon ⊇ span degenerates to the full gap report")
  }
}
