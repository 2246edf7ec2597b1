package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SurvivalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def run(subjects: Seq[(String, Option[Long], Option[Boolean])])
      : Seq[(String, Long, Long, Long, Long, Long)] = {
    val df = subjects.toDF("g", "t", "obs")
    Survival.kaplanMeier(df, col("g"), col("t"), col("obs"))
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
  }

  test("textbook curve matches the reference recursion") {
    // classic KM example: events at 1,2,4; censored at 3,5
    val subj = Seq[(String, Option[Long], Option[Boolean])](
      ("g", Some(1L), Some(true)), ("g", Some(2L), Some(true)),
      ("g", Some(3L), Some(false)), ("g", Some(4L), Some(true)),
      ("g", Some(5L), Some(false)))
    val got = run(subj)
    // grid: t=1 n=5 d=1; t=2 n=4 d=1; t=3 n=3 d=0 c=1; t=4 n=2 d=1; t=5 n=1 c=1
    val surv = Survival.kaplanMeierRef(
      Seq((1L, 5L, 1L), (2L, 4L, 1L), (3L, 3L, 0L), (4L, 2L, 1L), (5L, 1L, 0L)))
    assert(got.map(_._6) == surv)
    assert(got.map(r => (r._2, r._3, r._4, r._5)) ==
      Seq((1L, 5L, 1L, 0L), (2L, 4L, 1L, 0L), (3L, 3L, 0L, 1L),
        (4L, 2L, 1L, 0L), (5L, 1L, 0L, 1L)))
    // spot-check the truncating product: 10^6 *4/5 = 800000, *3/4 = 600000,
    // censor leaves it, *1/2 = 300000, last censor leaves it
    assert(got.map(_._6) == Seq(800000L, 600000L, 600000L, 300000L, 300000L))
  }

  test("event and censor at the SAME time: both at risk, censor leaves after") {
    val subj = Seq[(String, Option[Long], Option[Boolean])](
      ("g", Some(2L), Some(true)), ("g", Some(2L), Some(false)))
    val got = run(subj)
    assert(got == Seq(("g", 2L, 2L, 1L, 1L, 500000L)))
  }

  test("all censored: survival stays exactly 1000000 at every time") {
    val subj = Seq[(String, Option[Long], Option[Boolean])](
      ("g", Some(1L), Some(false)), ("g", Some(3L), Some(false)),
      ("g", Some(7L), Some(false)))
    assert(run(subj).map(_._6) == Seq(1000000L, 1000000L, 1000000L))
  }

  test("everyone dies at once: survival drops to 0") {
    val subj = Seq[(String, Option[Long], Option[Boolean])](
      ("g", Some(4L), Some(true)), ("g", Some(4L), Some(true)))
    assert(run(subj) == Seq(("g", 4L, 2L, 2L, 0L, 0L)))
  }

  test("null duration or observed is excluded, not miscounted") {
    val subj = Seq[(String, Option[Long], Option[Boolean])](
      ("g", Some(1L), Some(true)), ("g", None, Some(true)),
      ("g", Some(2L), None))
    assert(run(subj) == Seq(("g", 1L, 1L, 1L, 0L, 0L)))
  }

  test("groups are independent strata") {
    val subj = Seq[(String, Option[Long], Option[Boolean])](
      ("a", Some(1L), Some(true)), ("a", Some(2L), Some(false)),
      ("b", Some(1L), Some(false)), ("b", Some(2L), Some(true)))
    val got = run(subj)
    assert(got == Seq(
      ("a", 1L, 2L, 1L, 0L, 500000L), ("a", 2L, 1L, 0L, 1L, 500000L),
      ("b", 1L, 2L, 0L, 1L, 1000000L), ("b", 2L, 1L, 1L, 0L, 0L)))
  }
}
