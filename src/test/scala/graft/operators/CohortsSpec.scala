package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CohortsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (user, type, ts)
  private val fixture = Seq(
    (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full funnel
    (2L, "view", 10L), (2L, "click", 5L),                         // click BEFORE view
    (3L, "view", 10L), (3L, "click", 10L),                        // tie is not "after"
    (4L, "click", 10L), (4L, "purchase", 20L),                    // never viewed
    (5L, "view", 10L), (5L, "click", 20L), (5L, "purchase", 15L), // purchase mid-funnel
    (6L, "view", 40L), (6L, "view", 10L), (6L, "click", 20L)      // EARLIEST view counts
  ).toDF("u", "et", "ts")

  test("funnel honors strict temporal order per stage") {
    val times = Cohorts.funnelTimes(fixture, "u", "et", "ts",
        Seq("view", "click", "purchase"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(times(1L) == ((Some(10L), Some(20L), Some(30L))))
    assert(times(2L) == ((Some(10L), None, None)), "click before view must not count")
    assert(times(3L) == ((Some(10L), None, None)), "same-instant click is not after")
    assert(times(4L) == ((None, None, None)), "no view -> no funnel entry")
    assert(times(5L) == ((Some(10L), Some(20L), None)), "purchase before click must not count")
    assert(times(6L) == ((Some(10L), Some(20L), None)), "earliest view opens the funnel")
  }

  test("funnel summary counts are stage-monotone and match the fixture") {
    val got = Cohorts.funnelSummary(fixture, "u", "et", "ts",
        Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 5L), (2L, "click", 3L), (3L, "purchase", 1L)))
  }

  test("funnel over zero events reports zero users per stage, not null") {
    val empty = spark.emptyDataset[(Long, String, Long)].toDF("u", "et", "ts")
    val got = Cohorts.funnelSummary(empty, "u", "et", "ts", Seq("view", "click"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 0L), (2L, "click", 0L)))
  }

  test("rolling distinct matches the naive per-period set union") {
    val ev = Seq(
      (1L, 0L), (2L, 0L),           // day 0: {1,2}
      (1L, 1L),                     // day 1: {1}
      (3L, 5L),                     // day 5: {3}
      (1L, 9L), (1L, 9L)            // day 9: {1}, duplicate activity
    ).toDF("u", "p")
    val got = Cohorts.rollingDistinct(ev, "u", org.apache.spark.sql.functions.col("p"), 3)
      .as[(Long, Long)].collect().toMap
    // window 3 trailing: day 0 <- {0}, day 1 <- {0,1}, day 5 <- {5}, day 9 <- {9}
    assert(got == Map(0L -> 2L, 1L -> 2L, 5L -> 1L, 9L -> 1L))
    // only observed periods are reported (no day 2 row even though day 0 reaches it)
    assert(!got.contains(2L))
  }

  test("cohort retention assigns users to their first period and counts distinct") {
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, 3L),         // cohort 0, offsets 0,1,3
      (2L, 0L), (2L, 0L),                   // duplicate activity collapses
      (3L, 1L), (3L, 2L)                    // cohort 1, offsets 0,1
    ).toDF("u", "p")
    val got = Cohorts.cohortRetention(ev, "u", org.apache.spark.sql.functions.col("p"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }
}
