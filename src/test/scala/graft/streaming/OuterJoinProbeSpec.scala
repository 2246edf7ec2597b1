package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X5b: the stream-stream LEFT OUTER interval join — null-emission on
  * watermark expiry, incl. the rows nearest the end of the replay (the
  * two-wave flush contract), and matched rows staying identical to the
  * inner join's.
  */
class OuterJoinProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
  private val base = 1700000000L

  test("unmatched left rows ALL emit nulls — including the latest (r11)") {
    val left = Seq((1L, 101L, ts(base)), (2L, 102L, ts(base + 1000)),
      (3L, 103L, ts(base + 6000)))
      .toDF("l_key", "l_id", "l_ts")
    val right = Seq((99L, 999L, ts(base))).toDF("r_key", "r_id", "r_ts")
    val got = Streams.intervalJoinLeftOuter(spark, left, right, gapSec = 1800,
      queryName = s"ivjl_probe_${System.nanoTime()}")
    val rows = got.select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(rows == Set((101L, -1L), (102L, -1L), (103L, -1L)), s"got $rows")
  }

  test("matched rows join once; in-window vs out-of-window split (r11)") {
    // key 1: click 600s before the purchase (in the 1800s window);
    // key 2: click 3000s before (outside) -> null row
    val left = Seq((1L, 11L, ts(base + 5000)), (2L, 22L, ts(base + 5000)))
      .toDF("l_key", "l_id", "l_ts")
    val right = Seq((1L, 91L, ts(base + 4400)), (2L, 92L, ts(base + 2000)))
      .toDF("r_key", "r_id", "r_ts")
    val got = Streams.intervalJoinLeftOuter(spark, left, right, gapSec = 1800,
      queryName = s"ivjl_probe2_${System.nanoTime()}")
    val rows = got.select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(rows == Set((11L, 91L), (22L, -1L)), s"got $rows")
  }

  test("full outer: unmatched rows on BOTH sides emit (r11)") {
    // key 1 matches; purchase 22 has no click; click 93 has no purchase
    val left = Seq((1L, 11L, ts(base + 5000)), (2L, 22L, ts(base + 5000)))
      .toDF("l_key", "l_id", "l_ts")
    val right = Seq((1L, 91L, ts(base + 4400)), (3L, 93L, ts(base + 100)))
      .toDF("r_key", "r_id", "r_ts")
    val got = Streams.intervalJoinFullOuter(spark, left, right, gapSec = 1800,
      queryName = s"ivjf_probe_${System.nanoTime()}")
    val rows = got.select("l_id", "r_id").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(rows == Set((11L, 91L), (22L, -1L), (-1L, 93L)), s"got $rows")
  }
}
