package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fixture = Seq(
    (Option(1L), Option("A"), Option(10.0)),
    (Option(2L), Option("B"), Option(20.0)),
    (Option(2L), Option("C"), Option(-5.0)),  // dup key, bad status, below range
    (None, Option("A"), Option(200.0)),       // null key, above range
    (Option(3L), None, None)                  // null status, null value
  ).toDF("k", "st", "v")

  test("each constraint counts exactly its violations in one pass") {
    val got = Quality.report(fixture, "t", Seq(
      Quality.notNull("k"), Quality.unique("k"),
      Quality.inSet("st", Seq("A", "B")),
      Quality.inRange("v", lit(0.0), lit(100.0))))
      .as[(String, Long, Boolean)].collect().toMap2
    assert(got("t.not_null(k)") == ((1L, false)))
    assert(got("t.unique(k)") == ((1L, false)), "one extra row for the duplicated key")
    assert(got("t.in_set(st)") == ((2L, false)), "null + 'C'")
    assert(got("t.in_range(v)") == ((3L, false)), "null + -5 + 200")
  }

  test("an empty table PASSES its constraints (zero violations, not null)") {
    val empty = spark.emptyDataset[(Long, String, Double)].toDF("k", "st", "v")
    val got = Quality.report(empty, "t", Seq(
      Quality.notNull("k"), Quality.unique("k"),
      Quality.inSet("st", Seq("A")), Quality.inRange("v", lit(0.0), lit(1.0))))
      .as[(String, Long, Boolean)].collect()
    assert(got.length == 4)
    assert(got.forall { case (_, n, p) => n == 0L && p })
  }

  test("clean data passes every constraint") {
    val clean = Seq((1L, "A", 1.0), (2L, "B", 2.0)).toDF("k", "st", "v")
    val got = Quality.report(clean, "t", Seq(
      Quality.notNull("k"), Quality.unique("k"),
      Quality.inSet("st", Seq("A", "B")),
      Quality.inRange("v", lit(0.0), lit(100.0))))
      .as[(String, Long, Boolean)].collect()
    assert(got.forall { case (_, n, p) => n == 0L && p })
  }

  private implicit class ToMap2(rows: Array[(String, Long, Boolean)]) {
    def toMap2: Map[String, (Long, Boolean)] =
      rows.map { case (n, v, p) => n -> ((v, p)) }.toMap
  }

  test("lDiversity flags quasi-groups whose sensitive values collapse") {
    // type t1 day 1: two users, one shared diagnosis → diversity 1 (low)
    // type t1 day 2: three distinct values → diversity 3 (fine at l=3)
    // type t2 day 1: two distinct values → diversity 2 (low)
    val rows = Seq(
      ("t1", 1L, "flu"), ("t1", 1L, "flu"),
      ("t1", 2L, "a"), ("t1", 2L, "b"), ("t1", 2L, "c"),
      ("t2", 1L, "x"), ("t2", 1L, "y")).toDF("et", "day", "sens")
    val got = Quality.lDiversity(rows, col("et"), Seq(col("day")),
        col("sens"), l = 3L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map("t1" -> ((2L, 1L, 1L)), "t2" -> ((1L, 1L, 2L))))
  }

  test("lDiversity with l=1 reports no low-diversity groups") {
    val rows = Seq(("t", 1L, "v"), ("t", 2L, "v")).toDF("et", "day", "sens")
    val got = Quality.lDiversity(rows, col("et"), Seq(col("day")),
        col("sens"), l = 1L)
      .as[(String, Long, Long, Long)].collect().head
    assert(got == (("t", 2L, 0L, 1L)))
  }
}
