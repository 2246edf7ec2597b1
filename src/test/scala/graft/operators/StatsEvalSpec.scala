package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pinned-value cases for the statistics/experimentation kit:
  * chi-square 2×2, Gini split scoring, and the gains/lift table.
  */
class StatsEvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("chi2: perfect association gives chi2 = n (phi^2 = 1)") {
    // a=10, d=10, b=c=0 -> chi2 = n -> 20,000,000 ppm
    val rows = (Seq.fill(10)((true, true)) ++ Seq.fill(10)((false, false)))
      .toDF("pa", "pb")
    val got = Eval.chiSquare2x2(rows, lit("g"), col("pa"), col("pb"))
      .select(col("n"), col("chi2_ppm")).as[(Long, Long)].collect().head
    assert(got == ((20L, 20000000L)))
  }

  test("chi2: exact independence gives 0; degenerate margin gives null") {
    val indep = (Seq.fill(5)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(5)((false, false)))
      .toDF("pa", "pb")
    assert(Eval.chiSquare2x2(indep, lit("g"), col("pa"), col("pb"))
      .select(col("chi2_ppm")).as[Long].collect().head == 0L)
    val degenerate = Seq((true, true), (true, false)).toDF("pa", "pb")
    val row = Eval.chiSquare2x2(degenerate, lit("g"), col("pa"), col("pb"))
      .select(col("chi2_ppm")).collect().head
    assert(row.isNullAt(0), "empty ¬A row must report null, not 0")
  }

  test("chi2: groups are independent") {
    val rows = Seq(("g1", true, true), ("g1", false, false),
      ("g2", true, false), ("g2", false, true)).toDF("grp", "pa", "pb")
    val got = Eval.chiSquare2x2(rows, col("grp"), col("pa"), col("pb"))
      .select(col("grp"), col("chi2_ppm")).as[(String, Long)].collect().toMap
    assert(got("g1") == 2000000L && got("g2") == 2000000L,
      "2x2 with one sample per diagonal cell is perfectly associated: chi2 = n = 2")
  }

  test("gini: even two-class slice = 500000 ppm, pure slice = 0, weights sum") {
    val rows = (Seq.fill(5)(("mixed", "a")) ++ Seq.fill(5)(("mixed", "b")) ++
      Seq.fill(10)(("pure", "a"))).toDF("f", "lbl")
    val got = Eval.giniSplit(rows, col("f"), col("lbl"))
      .select(col("feature_value"), col("n"), col("n_classes"),
        col("gini_ppm"), col("weight_ppm"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("mixed") == (("mixed", 10L, 2L, 500000L, 500000L)))
    assert(got("pure") == (("pure", 10L, 1L, 0L, 500000L)))
  }

  test("gini: three even classes = 2/3 in ppm (666666, floor division)") {
    val rows = Seq("a", "b", "c").flatMap(c => Seq.fill(3)(("v", c)))
      .toDF("f", "lbl")
    val g = Eval.giniSplit(rows, col("f"), col("lbl"))
      .select(col("gini_ppm")).as[Long].collect().head
    assert(g == 666666L, s"(81-27)*1e6 div 81 = 666666, got $g")
  }

  test("gains table: pinned two-tile capture and lift") {
    // 4 rows, scores 4..1, positives at scores 4 and 3 -> tile 1 takes
    // both positives: capture 1e6, lift = (2*4*1e6) div (2*2) = 2e6
    val rows = Seq((true, 4L, 1L), (true, 3L, 2L), (false, 2L, 3L),
      (false, 1L, 4L)).toDF("lbl", "scr", "id")
    val got = Eval.gainsTable(rows, col("lbl"), col("scr"), col("id"), 2)
      .select(col("tile"), col("n"), col("n_pos"), col("cum_n"),
        col("cum_pos"), col("capture_ppm"), col("lift_ppm"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(got(0) == ((1L, 2L, 2L, 2L, 2L, 1000000L, 2000000L)))
    assert(got(1) == ((2L, 2L, 0L, 4L, 2L, 1000000L, 1000000L)))
  }

  test("gains table: zero positives report null ppm, counts still fill") {
    val rows = Seq((false, 4L, 1L), (false, 3L, 2L), (false, 2L, 3L),
      (false, 1L, 4L)).toDF("lbl", "scr", "id")
    val r = Eval.gainsTable(rows, col("lbl"), col("scr"), col("id"), 2)
      .orderBy(col("tile")).collect().head
    assert(r.getAs[Long]("n") == 2L)
    assert(r.isNullAt(r.fieldIndex("capture_ppm")))
    assert(r.isNullAt(r.fieldIndex("lift_ppm")))
  }

  test("gains table: ties on score break on id, deterministically") {
    // equal scores: id order decides the tile split; rerun must agree
    val rows = Seq((true, 5L, 10L), (false, 5L, 20L)).toDF("lbl", "scr", "id")
    val a = Eval.gainsTable(rows, col("lbl"), col("scr"), col("id"), 2)
      .orderBy(col("tile")).select(col("n_pos")).as[Long].collect().toSeq
    assert(a == Seq(1L, 0L), "lower id -> tile 1 under (score desc, id)")
  }
}
