package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ChangepointSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def runCusum(xs: Seq[Long], k: Long): Seq[Long] = {
    val df = xs.zipWithIndex.map { case (x, i) => ("s", i.toLong, x) }
      .toDF("key", "t", "x")
    Changepoint.cusum(df, Seq("key"), "t", col("x"), lit(k))
      .orderBy(col("t")).select(col("s")).as[Long].collect().toSeq
  }

  test("closed form over prefix sums equals the direct recursion") {
    val cases = Seq(
      (Seq(5L, 5L, 5L), 5L),                    // flat at target -> all 0
      (Seq(10L, 0L, 10L, 0L), 5L),              // oscillating
      (Seq(0L, 0L, 100L, 100L, 0L), 10L),       // burst then recovery
      (Seq(1L, 2L, 3L, 4L, 5L, 50L), 3L),       // drift up
      (Seq(-5L, -5L, 20L), 0L),                 // negative inputs
      (Seq(7L), 3L))                            // singleton
    cases.foreach { case (xs, k) =>
      assert(runCusum(xs, k) == Changepoint.cusumRef(xs, k),
        s"closed form diverged from recursion on xs=$xs k=$k")
    }
  }

  test("statistic is non-negative and resets after deficits") {
    val got = runCusum(Seq(0L, 0L, 0L, 100L), 10L)
    assert(got.forall(_ >= 0L))
    assert(got.take(3) == Seq(0L, 0L, 0L), "below-target prefix stays at zero")
    assert(got(3) == 90L, "the burst registers immediately, undiluted by the deficit")
  }

  test("keys are independent series") {
    val df = Seq(("a", 0L, 100L), ("a", 1L, 100L), ("b", 0L, 0L), ("b", 1L, 0L))
      .toDF("key", "t", "x")
    val got = Changepoint.cusum(df, Seq("key"), "t", col("x"), lit(10L))
      .select(col("key"), col("t"), col("s")).as[(String, Long, Long)]
      .collect().map { case (k, t, s) => (k, t) -> s }.toMap
    assert(got(("a", 1L)) == 180L && got(("b", 1L)) == 0L)
  }

  private def runEwma(xs: Seq[Long], alphaPpm: Long): Seq[Long] = {
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, i.toLong, x) }
      .toDF("key", "id", "ts", "x")
    Changepoint.ewma(df, col("key"), col("id"), col("ts"), col("x"), alphaPpm)
      .orderBy(col("id")).select(col("ewma_milli")).as[Long].collect().toSeq
  }

  test("ewma: distributed walk equals the truncating recursion") {
    val cases = Seq(
      (Seq(100L, 200L, 300L), 200000L),     // ramp
      (Seq(500L, 0L, 500L, 0L), 500000L),   // oscillation
      (Seq(7L), 123456L),                   // singleton
      (Seq(1L, 1L, 1L, 1000000L), 1L),      // tiny alpha, late spike
      (Seq(333L, 333L, 334L), 333333L))     // truncation-sensitive
    cases.foreach { case (xs, a) =>
      assert(runEwma(xs, a) == Changepoint.ewmaRef(xs, a),
        s"walk diverged from recursion on xs=$xs alpha=$a")
    }
  }

  test("ewma: alpha = 1e6 tracks the input exactly, milli-scaled") {
    assert(runEwma(Seq(5L, 9L, 2L), 1000000L) == Seq(5000L, 9000L, 2000L))
  }

  test("ewma: ts ties break on id — the engines' shared total order") {
    val df = Seq((1L, 2L, 10L, 100L), (1L, 1L, 10L, 900L))
      .toDF("key", "id", "ts", "x")
    val got = Changepoint.ewma(df, col("key"), col("id"), col("ts"),
        col("x"), 500000L)
      .orderBy(col("id")).select(col("ewma_milli")).as[Long].collect().toSeq
    // id 1 first: m=900000; then id 2: (500000*100*1000+500000*900000)div 1e6
    assert(got == Seq(900000L, 500000L))
  }

  test("ewma: keys smooth independently") {
    val df = Seq((1L, 1L, 1L, 100L), (1L, 2L, 2L, 200L),
      (2L, 3L, 1L, 800L)).toDF("key", "id", "ts", "x")
    val got = Changepoint.ewma(df, col("key"), col("id"), col("ts"),
        col("x"), 500000L)
      .select(col("key"), col("id"), col("ewma_milli"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 150000L && got((2L, 3L)) == 800000L)
  }

  // --------------------------------------------------------- R130 Holt

  private def runHolt(xs: Seq[Long], a: Long, b: Long)
      : Seq[(Long, Long, Long)] = {
    val df = xs.zipWithIndex
      .map { case (v, i) => (1L, i.toLong, i.toLong, v) }
      .toDF("key", "id", "ts", "x")
    Changepoint.holt(df, col("key"), col("id"), col("ts"), col("x"), a, b)
      .orderBy(col("id"))
      .select(col("level_milli"), col("trend_milli"), col("forecast_milli"))
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("holt: matches the reference recursion, forecast = level + trend") {
    val xs = Seq(100L, 120L, 90L, 200L, 210L, 50L)
    val ref = Changepoint.holtRef(xs, 200000L, 100000L)
    val got = runHolt(xs, 200000L, 100000L)
    assert(got.map(r => (r._1, r._2)) == ref)
    assert(got.forall(r => r._3 == r._1 + r._2))
  }

  test("holt: a declining series carries a NEGATIVE trend (trunc contract)") {
    val got = runHolt(Seq(1000L, 500L, 100L, 50L), 500000L, 500000L)
    assert(got.last._2 < 0L)
    // truncation toward zero on the signed trend — DuckDB's integer //
    // semantics — replayed by the reference recursion
    assert(got.map(r => (r._1, r._2)) ==
      Changepoint.holtRef(Seq(1000L, 500L, 100L, 50L), 500000L, 500000L))
  }

  test("holt: beta = 1 makes the trend the full level delta") {
    val xs = Seq(100L, 200L, 300L)
    val got = runHolt(xs, 1000000L, 1000000L)
    // alpha=1: level tracks x exactly; beta=1: trend = level delta
    assert(got.map(_._1) == Seq(100000L, 200000L, 300000L))
    assert(got.map(_._2) == Seq(0L, 100000L, 100000L))
  }

  test("holt: keys walk independently and ties break on id") {
    val df = Seq((1L, 2L, 10L, 100L), (1L, 1L, 10L, 900L),
      (2L, 3L, 1L, 700L)).toDF("key", "id", "ts", "x")
    val got = Changepoint.holt(df, col("key"), col("id"), col("ts"),
        col("x"), 500000L, 500000L)
      .select(col("key"), col("id"), col("level_milli"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 1L)) == 900000L) // id 1 is the seed despite equal ts
    assert(got((2L, 3L)) == 700000L)
  }

  // --------------------------------------------------- R142 seasonal Holt

  private def runHw(xs: Seq[Long], m: Int, a: Long, b: Long)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, i.toLong, x) }
      .toDF("key", "id", "ts", "x")
    Changepoint.holtSeasonal(df, col("key"), col("id"), col("ts"), col("x"),
        m, a, b)
      .orderBy(col("id"))
      .select(col("phase"), col("seasonal_milli"), col("level_milli"),
        col("trend_milli"), col("forecast_milli"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
  }

  test("seasonal holt: matches the reference walk on a trending series") {
    val xs = Seq(100L, 220L, 130L, 120L, 260L, 140L, 150L, 280L, 180L)
    val got = runHw(xs, 3, 300000L, 200000L)
    val ref = Changepoint.holtSeasonalRef(xs, 3, 300000L, 200000L)
    assert(got == ref.map(r => (r._1.toLong, r._2, r._3, r._4, r._5)))
  }

  test("seasonal holt: a pure periodic series forecasts itself exactly") {
    // repeating [10, 20, 30]: deseasonalized is constant, trend stays 0,
    // forecast = level + next phase's index = the next value, exactly
    val xs = Seq(10L, 20L, 30L, 10L, 20L, 30L, 10L, 20L, 30L)
    val got = runHw(xs, 3, 200000L, 100000L)
    assert(got.forall(_._4 == 0L), "no trend on a flat deseasonalized walk")
    assert(got.forall(_._3 == 20000L), "level = the global mean in milli")
    got.init.zip(xs.tail).foreach { case (row, next) =>
      assert(row._5 == next * 1000L, "one-step forecast is exact")
    }
  }

  test("seasonal holt: series shorter than the period uses 0 for unseen phases") {
    val got = runHw(Seq(100L, 200L), 4, 500000L, 500000L)
    assert(got.map(_._1) == Seq(1L, 2L))
    // last row's next phase (3) never observed -> forecast = l + b + 0
    assert(got.last._5 == got.last._3 + got.last._4)
  }

  // ---------------------------------------------- R143 forecast error

  private def runFe(rows: Seq[(Long, Long)], m: Int)
      : (Long, Option[Long], Option[Long], Option[Long], Option[Long],
         Option[Long]) = {
    // rows: (x, forecast_milli) at positions 0..n-1
    val df = rows.zipWithIndex
      .map { case ((x, f), i) => (1L, i.toLong, x, f) }
      .toDF("key", "id", "x", "forecast_milli")
    Changepoint.forecastError(df, col("key"), col("id"), col("x"),
        col("forecast_milli"), m)
      .select(col("n"), col("mae_model_milli"), col("mae_naive_milli"),
        col("mae_snaive_milli"), col("mase_ppm"), col("smase_ppm"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long],
        Option[Long])]
      .collect().head
  }

  test("forecast error: a perfect forecaster scores MASE 0") {
    val xs = Seq(10L, 12L, 14L, 16L)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (x, if (i + 1 < xs.size) xs(i + 1) * 1000L else 0L)
    }
    val got = runFe(rows, 2)
    assert(got._2.contains(0L), "model MAE is zero")
    assert(got._3.contains(2000L), "naive MAE = the constant step")
    assert(got._5.contains(0L))
  }

  test("forecast error: forecasting the last value IS the naive baseline") {
    val xs = Seq(5L, 9L, 4L, 11L, 7L)
    val rows = xs.map(x => (x, x * 1000L))
    val got = runFe(rows, 2)
    assert(got._2 == got._3, "model MAE equals naive MAE")
    assert(got._5.contains(1000000L), "MASE is exactly 1e6")
  }

  test("forecast error: single tick yields NULL metrics, n = 1") {
    val got = runFe(Seq((42L, 0L)), 2)
    assert(got._1 == 1L)
    assert(got._2.isEmpty && got._3.isEmpty && got._5.isEmpty)
  }

  // ------------------------------------------- R144 seasonal strength

  private def runSs(xs: Seq[Long], m: Int): (Long, Option[Long]) = {
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, i.toLong, x) }
      .toDF("key", "id", "ts", "x")
    Changepoint.seasonalStrength(df, col("key"), col("id"), col("ts"),
        col("x"), m)
      .select(col("n"), col("strength_ppm"))
      .as[(Long, Option[Long])].collect().head
  }

  test("seasonal strength: pure periodic is 1e6, constant is NULL") {
    assert(runSs(Seq(10L, 20L, 30L, 10L, 20L, 30L, 10L, 20L, 30L), 3)
      == ((9L, Some(1000000L))))
    assert(runSs(Seq(7L, 7L, 7L, 7L), 2) == ((4L, None)))
  }

  test("seasonal strength: period mismatched to the cycle explains nothing") {
    // period-2 signal examined at period 3: every phase sees the same
    // mix, indices land at 0, deseasonalized variance = raw variance
    val got = runSs(Seq(0L, 100L, 0L, 100L, 0L, 100L), 3)
    assert(got._2.contains(0L))
  }

  // ------------------------------------------- R145 MA decomposition

  private def runMa(xs: Seq[Long], m: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, i.toLong, x) }
      .toDF("key", "id", "ts", "x")
    Changepoint.decomposeMA(df, col("key"), col("id"), col("ts"), col("x"), m)
      .orderBy(col("id"))
      .select(col("x"), col("phase"), col("trend_milli"),
        col("seasonal_milli"), col("remainder_milli"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
  }

  test("MA decomposition: the additive identity closes bit-exactly") {
    val xs = Seq(30L, 20L, 10L, 28L, 19L, 12L, 31L, 17L, 9L, 26L)
    val got = runMa(xs, 3)
    got.foreach { case (x, _, t, s, r) =>
      assert(x * 1000L == t + s + r, s"identity broken at x=$x")
    }
  }

  // --------------------------------------------- R146/R147 trend kit

  private def runTrend(rows: Seq[(Long, Long)])
      : (Long, Long, Long, Option[Long], Option[Long]) = {
    // rows: (ts, x)
    val df = rows.zipWithIndex
      .map { case ((ts, x), i) => (1L, i.toLong, ts, x) }
      .toDF("key", "id", "ts", "x")
    Changepoint.trendTest(df, col("key"), col("id"), col("ts"), col("x"))
      .select(col("n"), col("n_pairs"), col("s_stat"), col("slope_milli"),
        col("z2_ppm"))
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().head
  }

  test("trend: a strict uniform ramp pins S, slope, and z²") {
    val rows = (1L to 5L).map(t => (t, t * 10))
    val (n, m, s, slope, z2) = runTrend(rows)
    assert((n, m, s) == ((5L, 10L, 10L)), "all 10 pairs concordant")
    assert(slope.contains(10000L), "every pairwise slope is exactly 10/tick")
    // var18 = 5*4*15 = 300; (|S|-1)^2 * 18e6 / 300 = 81 * 60000
    assert(z2.contains(4860000L))
  }

  test("trend: brute-force parity on a jagged tied series") {
    val rows = Seq((1L, 5L), (2L, 9L), (3L, 5L), (5L, 12L), (6L, 9L),
      (8L, 5L))
    val (n, m, s, slope, z2) = runTrend(rows)
    var refS = 0L
    val sl = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (i <- rows.indices; j <- (i + 1) until rows.size) {
      refS += java.lang.Long.signum(rows(j)._2 - rows(i)._2)
      sl += (rows(j)._2 - rows(i)._2) * 1000L / (rows(j)._1 - rows(i)._1)
    }
    assert((n, m, s) == ((6L, 15L, refS)))
    assert(slope.contains(sl.sorted.apply((sl.size + 1) / 2 - 1)))
    val tt = rows.groupBy(_._2).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val var18 = 6L * 5 * 17 - tt
    val expZ2 = (math.abs(refS) - 1L) * (math.abs(refS) - 1L) *
      18000000L / var18
    assert(z2.contains(if (refS == 0) 0L else expZ2))
  }

  test("trend: a flat series reports S = 0, z² = 0, slope 0") {
    assert(runTrend((1L to 4L).map(t => (t, 7L)))
      == ((4L, 6L, 0L, Some(0L), Some(0L))))
  }

  test("trend: per-pair slope division truncates toward zero") {
    // one pair: dx = -7 over dt = 3 -> -7000/3 trunc = -2333 (floor -2334)
    val (_, _, _, slope, _) = runTrend(Seq((0L, 7L), (3L, 0L)))
    assert(slope.contains(-2333L))
  }

  // ------------------------------------------ R148/R149 randomness

  private def runRand(xs: Seq[Long])
      : (Long, Long, Long, Long, Option[Long], Long, Option[Long]) = {
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, i.toLong, x) }
      .toDF("key", "id", "ts", "x")
    Changepoint.randomnessTest(df, col("key"), col("id"), col("ts"), col("x"))
      .select(col("n"), col("n_pos"), col("n_neg"), col("n_runs"),
        col("runs_z2_ppm"), col("n_turning"), col("turning_z2_ppm"))
      .as[(Long, Long, Long, Long, Option[Long], Long, Option[Long])]
      .collect().head
  }

  test("randomness: an alternating series maximizes runs and turns") {
    val got = runRand(Seq(1L, 2L, 1L, 2L, 1L, 2L))
    // signs [+,-,+,-,+]: N=5, m=6, R=5; num = 25-5-12 = 8
    // z2 = 64*4*1e6 / (12*7) = 3047619
    assert((got._2, got._3, got._4) == ((3L, 2L, 5L)))
    assert(got._5.contains(3047619L))
    // all 4 interior points turn; (12-8)^2*1e7/67 = 2388059
    assert(got._6 == 4L)
    assert(got._7.contains(2388059L))
  }

  test("randomness: a monotone ramp has one run and no turns") {
    val got = runRand(Seq(1L, 3L, 6L, 10L, 15L))
    assert((got._2, got._3, got._4) == ((4L, 0L, 1L)))
    assert(got._5.isEmpty, "one-sided signs have no runs variance")
    assert(got._6 == 0L)
    // (0 - 2*3)^2 * 1e7 / (80-29) = 36e7/51 = 7058823
    assert(got._7.contains(7058823L))
  }

  test("randomness: zero diffs are skipped and plateaus never turn") {
    val got = runRand(Seq(5L, 5L, 6L, 6L, 4L))
    assert((got._2, got._3, got._4) == ((1L, 1L, 2L)))
    assert(got._5.isEmpty, "2m = N leaves no variance")
    assert(got._6 == 0L, "plateau shoulders are not strict extrema")
  }

  test("MA decomposition: interior trend of a periodic series is the mean") {
    val got = runMa(Seq(10L, 20L, 30L, 10L, 20L, 30L, 10L, 20L, 30L), 3)
    // interior rows (window fully populated) see one full cycle
    got.slice(1, 8).foreach { case (_, _, t, _, _) => assert(t == 20000L) }
    // edge rows average their truncated window, stated contract
    assert(got.head._3 == 15000L && got.last._3 == 25000L)
    assert(got.map(_._2) == Seq(1L, 2L, 3L, 1L, 2L, 3L, 1L, 2L, 3L))
  }
}
