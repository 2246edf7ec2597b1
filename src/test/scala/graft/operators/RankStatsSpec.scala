package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RankStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // ------------------------------------------------------------ R120 U

  private def runU(rows: Seq[(String, Boolean, Long)])
      : Map[String, (Long, Long, Long, Long, Option[Long])] = {
    val df = rows.toDF("g", "s", "v")
    RankStats.mannWhitneyU(df, col("g"), col("s"), col("v"))
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
  }

  /** Brute-force doubled-U via doubled midranks. */
  private def refU(rows: Seq[(Boolean, Long)]): (Long, Long) = {
    val sorted = rows.map(_._2).sorted
    def rank2(v: Long): Long = {
      val rmin = sorted.indexOf(v) + 1L
      val cnt = sorted.count(_ == v).toLong
      2 * rmin + cnt - 1
    }
    val na = rows.count(_._1).toLong
    val r2a = rows.filter(_._1).map(r => rank2(r._2)).sum
    val u2a = r2a - na * (na + 1)
    (na, u2a)
  }

  test("U matches brute-force midranks under heavy ties") {
    val rows = Seq(
      ("g", true, 3L), ("g", true, 5L), ("g", true, 5L), ("g", true, 9L),
      ("g", false, 1L), ("g", false, 5L), ("g", false, 5L), ("g", false, 7L),
      ("g", false, 9L))
    val (na, u2a) = refU(rows.map(r => (r._2, r._3)))
    val got = runU(rows)("g")
    assert((got._1, got._3) == ((na, u2a)))
    assert(got._3 + got._4 == 2 * got._1 * got._2) // u2_a + u2_b = 2*na*nb
  }

  test("complete separation lands AUC at 0 and 1000000") {
    val hi = (1L to 5L).map(v => ("g", true, v + 100L))
    val lo = (1L to 4L).map(v => ("g", false, v))
    val got = runU(hi ++ lo)("g")
    assert(got._5.contains(1000000L))
    val flipped = runU((hi ++ lo).map(r => (r._1, !r._2, r._3)))("g")
    assert(flipped._5.contains(0L))
  }

  test("identical distributions land AUC at exactly 500000") {
    val rows = (1L to 6L).flatMap(v => Seq(("g", true, v), ("g", false, v)))
    assert(runU(rows)("g")._5.contains(500000L))
  }

  test("an empty side yields NULL AUC, zero U") {
    val got = runU(Seq(("g", false, 1L), ("g", false, 2L)))("g")
    assert(got == ((0L, 2L, 0L, 0L, None)))
  }

  // ------------------------------------------------------------ R121 Gini

  private def runGini(rows: Seq[(String, Long, Long)]): Map[String, Long] = {
    val df = rows.toDF("g", "x", "id")
    RankStats.giniCoefficient(df, "g", col("x"), col("id"))
      .select(col("grp"), col("gini_ppm"))
      .as[(String, Long)].collect().toMap
  }

  test("perfect equality scores 0, single-holder scores (n-1)/n") {
    val eq = (1L to 5L).map(i => ("e", 10L, i))
    val mono = ("m", 100L, 1L) +: (2L to 5L).map(i => ("m", 0L, i))
    val got = runGini(eq ++ mono)
    assert(got("e") == 0L)
    assert(got("m") == 800000L) // (5-1)/5
  }

  test("hand example: x = 1,2,3,4 ascending") {
    // sum ix = 1+4+9+16 = 30; (2*30 - 5*10)*1e6 / (4*10) = 250000
    assert(runGini((1L to 4L).map(i => ("g", i, i)))("g") == 250000L)
  }

  // ------------------------------------------------------------ R122 TV

  private def runTv(rows: Seq[(String, String, Boolean)])
      : Map[String, (Long, Long, Long, Option[Long])] = {
    val df = rows.toDF("g", "c", "s")
    RankStats.totalVariation(df, col("g"), col("c"), col("s"))
      .as[(String, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("identical mixes score 0, disjoint supports score 1000000") {
    val same = Seq(("i", "x", true), ("i", "y", true),
      ("i", "x", false), ("i", "y", false))
    val disj = Seq(("d", "x", true), ("d", "y", false))
    val got = runTv(same ++ disj)
    assert(got("i")._4.contains(0L))
    assert(got("d")._4.contains(1000000L))
  }

  test("hand example: P=(1/2,1/2), Q=(3/4,1/4) -> TV = 1/4") {
    val rows = Seq(("g", "x", true), ("g", "y", true),
      ("g", "x", false), ("g", "x", false), ("g", "x", false),
      ("g", "y", false))
    assert(runTv(rows)("g") == ((2L, 4L, 2L, Some(250000L))))
  }

  test("an empty side yields NULL") {
    assert(runTv(Seq(("g", "x", true)))("g")._4.isEmpty)
  }

  // ------------------------------------------------------------ R123 rho

  private def runRho(rows: Seq[(String, Long, Long, Long)])
      : Map[String, (Long, Long, Option[Long])] = {
    val df = rows.toDF("g", "x", "y", "id")
    RankStats.spearman(df, "g", col("x"), col("y"), col("id"))
      .as[(String, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("perfect monotone is 1000000, perfect inverse is -1000000") {
    val up = (1L to 6L).map(i => ("u", i, i * 10, i))
    val down = (1L to 6L).map(i => ("d", i, -i * 10, i))
    val got = runRho(up ++ down)
    assert(got("u") == ((6L, 0L, Some(1000000L))))
    assert(got("d")._3.contains(-1000000L))
  }

  test("hand example with one swap") {
    // x ranks 1..4; y ranks 1,2,4,3 -> d2 = 0+0+1+1 = 2
    // rho = 1e6 - 6*2*1e6/(4*15) = 1e6 - 200000 = 800000
    val rows = Seq(("g", 1L, 10L, 1L), ("g", 2L, 20L, 2L),
      ("g", 3L, 40L, 3L), ("g", 4L, 30L, 4L))
    assert(runRho(rows)("g") == ((4L, 2L, Some(800000L))))
  }

  test("ties resolve by id so equal values still rank deterministically") {
    // x all equal: rank_x = id order; y = id order too -> d2 = 0
    val rows = (1L to 4L).map(i => ("g", 7L, i, i))
    assert(runRho(rows)("g") == ((4L, 0L, Some(1000000L))))
  }

  test("singleton group has no correlation (NULL)") {
    assert(runRho(Seq(("g", 1L, 1L, 1L)))("g")._3.isEmpty)
  }
}
