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

  // ------------------------------------------------------- R132 log-rank

  private def runLr(subj: Seq[(String, Boolean, Long, Boolean)])
      : Map[String, (Long, Long, Long, Long, Long, Option[Long])] = {
    val df = subj.toDF("g", "s", "t", "obs")
    Survival.logRank(df, col("g"), col("s"), col("t"), col("obs"))
      .as[(String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7)))
      .toMap
  }

  /** Brute-force replay with the identical per-time flooring. */
  private def refLr(subj: Seq[(Boolean, Long, Boolean)])
      : (Long, Long, Long, Option[Long]) = {
    val times = subj.filter(_._3).map(_._2).distinct.sorted
    var oa = 0L; var e = BigInt(0); var v = BigInt(0)
    for (t <- times) {
      val at = subj.filter(_._2 >= t)
      val n = at.size.toLong; val na = at.count(_._1).toLong
      val d = subj.count(x => x._2 == t && x._3).toLong
      val da = subj.count(x => x._1 && x._2 == t && x._3).toLong
      oa += da
      e += BigInt(d) * na * 1000000 / n
      if (n > 1)
        v += BigInt(d) * na * (n - na) * (n - d) * 1000000 /
          (BigInt(n) * n * (n - 1))
    }
    val chi =
      if (v == 0) None
      else Some(((BigInt(oa) * 1000000 - e).pow(2) * 1000 /
        (v * 1000000)).toLong)
    (oa, e.toLong, v.toLong, chi)
  }

  test("log-rank matches the flooring reference on a mixed cohort") {
    val cohort = Seq(
      (true, 1L, true), (true, 3L, true), (true, 5L, false),
      (true, 7L, true), (false, 2L, true), (false, 2L, true),
      (false, 4L, false), (false, 6L, true), (false, 8L, false))
    val got = runLr(cohort.map(c => ("g", c._1, c._2, c._3)))("g")
    val (oa, e, v, chi) = refLr(cohort)
    assert((got._3, got._4, got._5, got._6) == ((oa, e, v, chi)))
    assert((got._1, got._2) == ((4L, 5L)))
  }

  test("identical curves in both arms score chi2 = 0") {
    // perfectly mirrored arms: every event time has one event per side
    val cohort = (1L to 4L).flatMap(t =>
      Seq((true, t, true), (false, t, true)))
    val got = runLr(cohort.map(c => ("g", c._1, c._2, c._3)))("g")
    assert(got._6.contains(0L))
  }

  test("complete separation scores a large chi2") {
    val cohort = (1L to 5L).map(t => (true, t, true)) ++
      (11L to 15L).map(t => (false, t, true))
    val got = runLr(cohort.map(c => ("g", c._1, c._2, c._3)))("g")
    val (_, _, _, chi) = refLr(cohort)
    assert(got._6 == chi && got._6.get > 5000L) // chi2 > 5 in milli
  }

  test("no usable event times (V = 0) reports NULL chi2") {
    // all censored: no event rows at all
    val got = runLr(Seq(("g", true, 3L, false), ("g", false, 4L, false)))("g")
    assert(got == ((1L, 1L, 0L, 0L, 0L, None)))
  }
}
