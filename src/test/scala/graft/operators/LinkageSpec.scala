package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** D16: Fellegi–Sunter linkage scoring. */
class LinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import Linkage.FieldCmp

  private val pairs = Seq(
    // (id_a, id_b, seg equal?, bal close?)
    (1L, 2L, true, true), (1L, 3L, true, false),
    (2L, 3L, false, true), (4L, 5L, false, false))
    .toDF("id_a", "id_b", "segEq", "balEq")

  private val fields = Seq(
    FieldCmp("seg", col("segEq"), 2000L, -500L),
    FieldCmp("bal", col("balEq"), 3000L, -1000L))

  test("score is the exact weight sum; bits record per-field agreement") {
    val got = Linkage.score(pairs, fields, matchMilli = 4000L,
        possibleMilli = 1000L)
      .select("id_a", "id_b", "agreement_bits", "match_score", "decision")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, 2L)) == ((3L, 5000L, "match")))
    assert(got((1L, 3L)) == ((1L, 1000L, "possible")))
    assert(got((2L, 3L)) == ((2L, 2500L, "possible")))
    assert(!got.contains((4L, 5L)), "non-match rows are dropped")
  }

  test("decision boundary: exactly at the match threshold is a match") {
    val got = Linkage.score(pairs, fields, matchMilli = 5000L,
        possibleMilli = 5000L)
      .select("id_a", "id_b", "decision").as[(Long, Long, String)].collect()
    assert(got.toSeq == Seq((1L, 2L, "match")))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      Linkage.score(pairs, Seq.empty, 1L, 0L)
    }
    intercept[IllegalArgumentException] {
      Linkage.score(pairs, fields, matchMilli = 0L, possibleMilli = 10L)
    }
  }
}
