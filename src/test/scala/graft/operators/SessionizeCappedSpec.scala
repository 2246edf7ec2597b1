package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** R104: capped sessionization (idle gap OR duration cap). */
class SessionizeCappedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], gap: Long,
                  cap: Long): Seq[(Long, Long, Long)] =
    Sequences.sessionizeCapped(rows.toDF("user_id", "event_id", "ts_sec"),
        col("user_id"), col("event_id"), col("ts_sec"), gap, cap)
      .orderBy("user_id", "ts_sec", "event_id")
      .select("event_id", "session_seq", "session_start_sec")
      .as[(Long, Long, Long)].collect().toSeq

  test("duration cap splits a chain the idle rule keeps together") {
    // events every 100s for 1000s: no idle gap > 150 ever fires, but the
    // 350s cap forces splits at elapsed > 350 from each session start
    val rows = (0L to 10L).map(i => (1L, i, i * 100L))
    val got = run(rows, gap = 150L, cap = 350L)
    // session 1: t=0..300 (400 > 350 splits); session 2: 400..700;
    // session 3: 800..1000
    assert(got.map(_._2) == Seq(1L, 1L, 1L, 1L, 2L, 2L, 2L, 2L, 3L, 3L, 3L))
    assert(got.map(_._3).distinct == Seq(0L, 400L, 800L))
  }

  test("idle rule still splits independently of the cap") {
    val rows = Seq((1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 10000L))
    val got = run(rows, gap = 500L, cap = 1000000L)
    assert(got.map(_._2) == Seq(1L, 1L, 2L))
  }

  test("simultaneous events tie-break on event id, deterministically") {
    val rows = Seq((1L, 5L, 100L), (1L, 3L, 100L), (1L, 4L, 100L))
    val got = run(rows, gap = 10L, cap = 10L)
    assert(got.map(_._1) == Seq(3L, 4L, 5L) && got.map(_._2).distinct == Seq(1L))
  }

  test("users sessionize independently") {
    val rows = Seq((1L, 1L, 0L), (2L, 2L, 0L), (1L, 3L, 5000L))
    val got = run(rows, gap = 100L, cap = 100L)
    assert(got.map(r => (r._1, r._2)).toSet == Set((1L, 1L), (2L, 1L), (3L, 2L)))
  }
}
