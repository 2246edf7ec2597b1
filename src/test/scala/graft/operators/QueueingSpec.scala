package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class QueueingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], s: Long) =
    Queueing.lindleyWait(rows.toDF("k", "id", "ts"),
        col("k"), col("id"), col("ts"), s)
      .as[(Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._3, r._2))

  test("a burst builds backlog, idle gaps drain it, never below zero") {
    // arrivals at 0,1,2,100 with 10s service: waits 0,9,18, then drained
    val ts = Seq(0L, 1L, 2L, 100L)
    val rows = ts.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }
    val got = run(rows, 10L).map(_._4)
    assert(got == Queueing.lindleyRef(ts, 10L))
    assert(got == Seq(0L, 9L, 18L, 0L))
  }

  test("saturated arrivals grow the wait linearly") {
    val ts = (0L to 4L).map(_ * 2)
    val rows = ts.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }
    // service 5, interarrival 2 → each arrival adds 3
    assert(run(rows, 5L).map(_._4) == Seq(0L, 3L, 6L, 9L, 12L))
  }

  test("keys queue independently; equal timestamps order by id") {
    val rows = Seq((1L, 1L, 0L), (1L, 2L, 0L), (2L, 3L, 0L))
    val got = run(rows, 7L)
    assert(got.map(_._4) == Seq(0L, 7L, 0L))
  }
}
