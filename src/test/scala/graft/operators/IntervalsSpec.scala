package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("islands finds maximal consecutive runs per key") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 7L), ("a", 8L),
      ("b", 5L), ("b", 5L), // duplicate activity collapses
      ("b", 7L)
    ).toDF("k", "p")
    val got = Intervals.islands(df, Seq("k"), col("p"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 1L, 3L, 3L), ("a", 7L, 8L, 2L),
      ("b", 5L, 5L, 1L), ("b", 7L, 7L, 1L)))
  }

  test("coalesce merges overlapping and touching intervals, keeps gaps apart") {
    val df = Seq(
      ("u", 0L, 10L), ("u", 5L, 20L),   // overlap -> [0,20]
      ("u", 20L, 30L),                  // touching (closed) -> [0,30]
      ("u", 40L, 50L),                  // gap -> new span
      ("v", 100L, 200L)
    ).toDF("k", "s", "e")
    val got = Intervals.coalesce(df, Seq("k"), col("s"), col("e"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("u", 0L, 30L, 3L), ("u", 40L, 50L, 1L), ("v", 100L, 200L, 1L)))
  }

  test("coalesce handles an interval fully contained in an earlier one") {
    val df = Seq(("u", 0L, 100L), ("u", 10L, 20L), ("u", 90L, 150L))
      .toDF("k", "s", "e")
    val got = Intervals.coalesce(df, Seq("k"), col("s"), col("e"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("u", 0L, 150L, 3L)),
      "running-max (not lag) must carry the covering interval's end forward")
  }
}
