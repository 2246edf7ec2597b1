package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM drift/changepoint detection over per-key ordered series — the
  * monitor a continuously-ingesting pipeline runs on its daily volume,
  * quality-score, and dedup-rate series to catch regime changes (a
  * crawler gone wrong, a source flipping format) rather than single-row
  * outliers (which the 3σ flagger catches).
  *
  * The textbook recursion Sₜ = max(0, Sₜ₋₁ + xₜ − k) looks inherently
  * sequential, but it has a closed form over prefix aggregates:
  *
  *   Pₜ = Σᵢ≤ₜ (xᵢ − k)        (running sum)
  *   Sₜ = Pₜ − min(0, minᵢ≤ₜ Pᵢ) (running min)
  *
  * because resetting at 0 is the same as re-basing the prefix sum at its
  * historical minimum (or at 0 if it never went negative). Two window
  * aggregates, partitioned per key — whole-stage codegen, no
  * iteration, no global sort; each key's series sorts only within its
  * partition. Arithmetic stays in the input's integral type, so with
  * integer inputs the statistic is exact (ChangepointSpec pins the
  * closed form against the direct recursion).
  */
object Changepoint {
  /** Append the one-sided CUSUM statistic `s` to a per-key series.
    *
    * @param series   one row per (key, order) tick
    * @param keyCols  series identity
    * @param orderCol total order within a key (e.g. epoch day)
    * @param x        the monitored integral measure
    * @param k        reference ("allowed drift") level per row —
    *                 typically the per-key mean, joined in by the caller
    * @return input columns plus `s` (the CUSUM statistic, ≥ 0)
    */
  def cusum(series: DataFrame, keyCols: Seq[String], orderCol: String,
            x: Column, k: Column): DataFrame = {
    val prefix = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series
      .withColumn("__p", sum(x - k).over(prefix))
      .withColumn("s", col("__p") - least(lit(0L), min(col("__p")).over(prefix)))
      .drop("__p")
  }

  /** Reference implementation of the recursion (specs only). */
  def cusumRef(xs: Seq[Long], k: Long): Seq[Long] =
    xs.scanLeft(0L)((s, x) => math.max(0L, s + x - k)).tail

  /** R116: EWMA smoothing in exact fixed point — the trend line behind
    * every monitoring dashboard, with a cross-engine bit contract: the
    * smoothed value is carried in MILLI-units of x and the recursion
    * truncates at every step,
    *
    *   m₁ = x₁·1000
    *   mₜ = (α_ppm·xₜ·1000 + (10⁶ − α_ppm)·mₜ₋₁) div 10⁶
    *
    * Unlike CUSUM's max(0, ·) reset, the EWMA recursion with PER-STEP
    * truncation has no prefix-aggregate closed form (the rounding error
    * compounds through every step), so it runs as a per-key walk in
    * flatMapGroups over the SAME (key) shuffle any per-key window pays —
    * the [[Sequences.sessionizeCapped]] posture: one exchange, per-key
    * memory = that key's tick count, keys process independently at any
    * parallelism. Ties in ts break on `id`, a total order both engines
    * replay identically.
    *
    * Headroom: |x| must stay below ~9·10⁹ (x·1000·10⁶ inside int64);
    * cents-scale inputs pass by 5 orders of magnitude.
    *
    * @return (key, id, ts_sec, x, ewma_milli)
    */
  def ewma(series: DataFrame, key: Column, id: Column, tsSec: Column,
           x: Column, alphaPpm: Long): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000, s"alphaPpm: $alphaPpm")
    val spark = series.sparkSession
    import spark.implicits._
    val typed = series.select(key.cast("long"), id.cast("long"),
      tsSec.cast("long"), x.cast("long")).as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroups { (k, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
        var m = Long.MinValue
        sorted.map { case (_, eid, t, v) =>
          m = if (m == Long.MinValue) v * 1000L
              else (alphaPpm * v * 1000L + (1000000L - alphaPpm) * m) / 1000000L
          (k, eid, t, v, m)
        }
      }
      .toDF("key", "id", "ts_sec", "x", "ewma_milli")
  }

  /** Reference EWMA recursion (specs only). */
  def ewmaRef(xs: Seq[Long], alphaPpm: Long): Seq[Long] =
    xs.tail.scanLeft(xs.head * 1000L)((m, v) =>
      (alphaPpm * v * 1000L + (1000000L - alphaPpm) * m) / 1000000L)

  /** R130: Holt linear-trend (double exponential) smoothing — the
    * forecast baseline one notch above EWMA: a level AND a trend, both
    * carried in milli-units with PER-STEP FLOOR division (Holt 1957;
    * standard form, public literature):
    *
    *   l₁ = x₁·1000, b₁ = 0
    *   lₜ = (α·xₜ·1000 + (10⁶−α)·(lₜ₋₁ + bₜ₋₁)) div 10⁶
    *   bₜ = (β·(lₜ − lₜ₋₁) + (10⁶−β)·bₜ₋₁) div 10⁶
    *
    * The trend is SIGNED, so the division contract matters and is
    * TRUNCATION toward zero — Scala's `Long./`, which is exactly what
    * DuckDB's integer `//` does (verified: −7 // 2 = −3); a floor
    * contract would silently diverge on the first negative trend.
    * One-step-ahead forecast = lₜ + bₜ emitted per tick. Same shape as
    * [[ewma]]: one (key) shuffle, per-key walk over its own rows only.
    */
  def holt(series: DataFrame, key: Column, id: Column, tsSec: Column,
           x: Column, alphaPpm: Long, betaPpm: Long): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000, s"alphaPpm: $alphaPpm")
    require(betaPpm >= 1 && betaPpm <= 1000000, s"betaPpm: $betaPpm")
    val spark = series.sparkSession
    import spark.implicits._
    val typed = series.select(key.cast("long"), id.cast("long"),
      tsSec.cast("long"), x.cast("long")).as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroups { (k, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
        var l = Long.MinValue
        var b = 0L
        sorted.map { case (_, eid, t, v) =>
          if (l == Long.MinValue) { l = v * 1000L; b = 0L }
          else {
            val lPrev = l
            l = (alphaPpm * v * 1000L + (1000000L - alphaPpm) * (l + b)) /
              1000000L
            b = (betaPpm * (l - lPrev) + (1000000L - betaPpm) * b) / 1000000L
          }
          (k, eid, t, v, l, b, l + b)
        }
      }
      .toDF("key", "id", "ts_sec", "x", "level_milli", "trend_milli",
        "forecast_milli")
  }

  /** Reference Holt recursion (specs only): xs → (level, trend) walk. */
  def holtRef(xs: Seq[Long], alphaPpm: Long, betaPpm: Long)
      : Seq[(Long, Long)] =
    xs.tail.scanLeft((xs.head * 1000L, 0L)) { case ((l, b), v) =>
      val l2 = (alphaPpm * v * 1000L + (1000000L - alphaPpm) * (l + b)) /
        1000000L
      val b2 = (betaPpm * (l2 - l) + (1000000L - betaPpm) * b) / 1000000L
      (l2, b2)
    }

  /** R142: seasonal Holt — [[holt]] extended with FROZEN additive
    * seasonal indices (the Holt–Winters decomposition with the seasonal
    * state estimated once, not recursed — the variant whose rounding
    * trajectory a SQL engine can replay: the full HW seasonal recursion
    * carries an m-vector of mutually-recursive state that has no
    * recursive-CTE shape, while frozen indices split cleanly into one
    * aggregate pass + the R130 recursion):
    *
    *   phase(t) = ((t−1) mod m) + 1 on the POSITION in the per-key
    *              series (order-derived, calendar-free)
    *   s_j      = (Σ_{phase j} x·1000) div n_j − (Σ x·1000) div n
    *   d_t      = x_t·1000 − s_phase(t)         (deseasonalized, milli)
    *   (l, b)   = the R130 recursion on d_t (per-step TRUNCATING
    *              division toward zero — DuckDB's `//`)
    *   forecast = l + b + s_phase(t+1)  (next position's index; 0 when
    *              that phase was never observed, i.e. n < m)
    *
    * Same execution shape as [[holt]]: ONE (key) shuffle, per-key walk,
    * keys independent. Headroom: |x|·1000·10⁶ inside int64 — counts and
    * cents both pass with orders of magnitude to spare.
    *
    * @return (key, id, ts_sec, x, phase, seasonal_milli, level_milli,
    *         trend_milli, forecast_milli)
    */
  def holtSeasonal(series: DataFrame, key: Column, id: Column,
                   tsSec: Column, x: Column, period: Int,
                   alphaPpm: Long, betaPpm: Long): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(alphaPpm >= 1 && alphaPpm <= 1000000, s"alphaPpm: $alphaPpm")
    require(betaPpm >= 1 && betaPpm <= 1000000, s"betaPpm: $betaPpm")
    val spark = series.sparkSession
    import spark.implicits._
    val typed = series.select(key.cast("long"), id.cast("long"),
      tsSec.cast("long"), x.cast("long")).as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroups { (k, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
        val n = sorted.size
        val meanAll = sorted.map(_._4 * 1000L).sum / n
        val sMilli: Map[Int, Long] = sorted.zipWithIndex
          .groupBy { case (_, i) => i % period + 1 }
          .map { case (p, g) =>
            p -> (g.map(_._1._4 * 1000L).sum / g.size - meanAll)
          }
        var l = Long.MinValue
        var b = 0L
        sorted.zipWithIndex.map { case ((_, eid, t, v), i) =>
          val p = i % period + 1
          val d = v * 1000L - sMilli(p)
          if (l == Long.MinValue) { l = d; b = 0L }
          else {
            val lPrev = l
            l = (alphaPpm * d + (1000000L - alphaPpm) * (l + b)) / 1000000L
            b = (betaPpm * (l - lPrev) + (1000000L - betaPpm) * b) / 1000000L
          }
          val sNext = sMilli.getOrElse((i + 1) % period + 1, 0L)
          (k, eid, t, v, p.toLong, sMilli(p), l, b, l + b + sNext)
        }
      }
      .toDF("key", "id", "ts_sec", "x", "phase", "seasonal_milli",
        "level_milli", "trend_milli", "forecast_milli")
  }

  /** R143: forecast-error report — MASE and friends for any per-key
    * one-step forecast column (Hyndman & Koehler 2006's scale-free
    * forecast accuracy, public literature), exactly rational:
    *
    *   mae_model  = Σ|x_{t+1}·1000 − forecast(t)| div (n−1)
    *   mae_naive  = Σ|x_{t+1} − x_t|·1000        div (n−1)
    *   mae_snaive = Σ|x_{t+m} − x_t|·1000        div (n−m)
    *   mase_ppm   = ae_model·n_naive·10⁶ div (n_model·ae_naive)
    *                (one floor — the two means' denominators cancel
    *                into the ratio), likewise smase vs seasonal naive
    *
    * < 10⁶ means the model beats the baseline. The lag join is a
    * per-KEY window (series are tick-bounded aggregates by contract —
    * the R130/R142 posture), one hash aggregate after it. NULL metrics
    * when the baseline error is 0 or the series is too short.
    *
    * @param forecasted output of [[holt]]/[[holtSeasonal]] (or any
    *                   frame with key, id, x, and a forecast column
    *                   where row t's forecast predicts row t+1's x)
    * @return (key, n, mae_model_milli, mae_naive_milli,
    *         mae_snaive_milli, mase_ppm, smase_ppm)
    */
  def forecastError(forecasted: DataFrame, key: Column, id: Column,
                    x: Column, forecastMilli: Column,
                    period: Int): DataFrame = {
    require(period >= 1, s"period must be >= 1, got $period")
    val w = Window.partitionBy(col("key")).orderBy(col("id"))
    forecasted.select(key.as("key"), id.as("id"), x.cast("long").as("x"),
        forecastMilli.cast("long").as("f"))
      .withColumn("x_prev", lag(col("x"), 1).over(w))
      .withColumn("f_prev", lag(col("f"), 1).over(w))
      .withColumn("x_prevm", lag(col("x"), period).over(w))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        sum(abs(col("x") * 1000 - col("f_prev"))).as("ae_model"),
        count(col("f_prev")).as("n_model"),
        sum(abs(col("x") - col("x_prev")) * 1000).as("ae_naive"),
        count(col("x_prev")).as("n_naive"),
        sum(abs(col("x") - col("x_prevm")) * 1000).as("ae_snaive"),
        count(col("x_prevm")).as("n_snaive"))
      .select(col("key"), col("n"),
        when(col("n_model") === 0, lit(null))
          .otherwise(expr("ae_model div n_model")).as("mae_model_milli"),
        when(col("n_naive") === 0, lit(null))
          .otherwise(expr("ae_naive div n_naive")).as("mae_naive_milli"),
        when(col("n_snaive") === 0, lit(null))
          .otherwise(expr("ae_snaive div n_snaive")).as("mae_snaive_milli"),
        when(col("n_model") === 0 ||
            coalesce(col("ae_naive"), lit(0L)) === 0, lit(null))
          .otherwise(expr(
            """CAST(CAST(ae_model AS DECIMAL(38,0)) * n_naive * 1000000
              | div (CAST(n_model AS DECIMAL(38,0)) * ae_naive) AS BIGINT)"""
              .stripMargin)).as("mase_ppm"),
        when(col("n_model") === 0 ||
            coalesce(col("ae_snaive"), lit(0L)) === 0, lit(null))
          .otherwise(expr(
            """CAST(CAST(ae_model AS DECIMAL(38,0)) * n_snaive * 1000000
              | div (CAST(n_model AS DECIMAL(38,0)) * ae_snaive) AS BIGINT)"""
              .stripMargin)).as("smase_ppm"))
  }

  /** R144: seasonal-strength report — how much of a series' variance
    * the R142 frozen seasonal indices explain, exactly:
    *
    *   strength_ppm = 10⁶ − Var(x·1000 − s_phase)·10⁶ div Var(x·1000)
    *
    * with both variances n²-scaled integer sums Σ(n·v − Σv)² — the
    * R131 trick, so the n² factors cancel in the ratio and nothing is
    * ever fractional. 10⁶ = the indices absorb everything, 0 = nothing,
    * NEGATIVE = deseasonalizing ADDED variance (a genuinely aseasonal
    * series — kept signed rather than clamped, the diagnostic is the
    * point). NULL for constant series. Same per-key walk as
    * [[holtSeasonal]]; sums accumulate in BigInt (n·x·1000 squared
    * exceeds int64 long before the inputs do).
    *
    * @return (key, n, strength_ppm)
    */
  def seasonalStrength(series: DataFrame, key: Column, id: Column,
                       tsSec: Column, x: Column, period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val spark = series.sparkSession
    import spark.implicits._
    val typed = series.select(key.cast("long"), id.cast("long"),
      tsSec.cast("long"), x.cast("long")).as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .mapGroups { (k, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
        val n = sorted.size
        val xm = sorted.map(_._4 * 1000L)
        val meanAll = xm.sum / n
        val sMilli: Map[Int, Long] = xm.zipWithIndex
          .groupBy(_._2 % period + 1)
          .map { case (p, g) => p -> (g.map(_._1).sum / g.size - meanAll) }
        val dm = xm.zipWithIndex.map { case (v, i) =>
          v - sMilli(i % period + 1)
        }
        def varN2(vs: Seq[Long]): BigInt = {
          val s = vs.map(BigInt(_)).sum
          vs.map(v => { val t = BigInt(n) * v - s; t * t }).sum
        }
        val (vx, vd) = (varN2(xm), varN2(dm))
        val strength =
          if (vx == 0) None
          else Some((BigInt(1000000) - vd * 1000000 / vx).toLong)
        (k, n.toLong, strength)
      }
      .toDF("key", "n", "strength_ppm")
  }

  /** R145: classical moving-average decomposition — x = trend +
    * seasonal + remainder, each part exact in milli-units:
    *
    *   trend(t)    = Σ_window x·1000 div |window|, the centered MA over
    *                 up to m rows (⌊m/2⌋ back, ⌈m/2⌉−1 forward; edge
    *                 rows average their TRUNCATED window — stated, so
    *                 both engines agree instead of emitting nulls)
    *   seasonal(j) = Σ_{phase j} (x·1000 − trend) div n_j  (phase =
    *                 position mod m, as in [[holtSeasonal]]; trunc
    *                 toward zero on the possibly-negative sum)
    *   remainder   = x·1000 − trend − seasonal
    *
    * The additive identity holds bit-exactly by construction. Windows
    * are per-KEY over tick-bounded series (the R130 posture); one
    * (key, phase) aggregate + a broadcast-size join back.
    *
    * @return (key, id, x, phase, trend_milli, seasonal_milli,
    *         remainder_milli)
    */
  def decomposeMA(series: DataFrame, key: Column, id: Column,
                  tsSec: Column, x: Column, period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val w = Window.partitionBy(col("key")).orderBy(col("ts_sec"), col("id"))
    val wma = w.rowsBetween(-(period / 2), (period - 1) / 2)
    val det = series.select(key.cast("long").as("key"),
        id.cast("long").as("id"), tsSec.cast("long").as("ts_sec"),
        x.cast("long").as("x"))
      .withColumn("phase",
        (((row_number().over(w) - 1) % period) + 1).cast("long"))
      .withColumn("__sx", sum(col("x") * 1000).over(wma))
      .withColumn("__cn", count(lit(1)).over(wma))
      .withColumn("trend_milli", expr("__sx div __cn"))
      .withColumn("__det", col("x") * 1000 - col("trend_milli"))
    val seas = det.groupBy(col("key"), col("phase"))
      .agg(sum(col("__det")).as("__sd"), count(lit(1)).as("__nd"))
      .select(col("key"), col("phase"),
        expr("__sd div __nd").as("seasonal_milli"))
    det.join(seas, Seq("key", "phase"))
      .select(col("key"), col("id"), col("x"), col("phase"),
        col("trend_milli"), col("seasonal_milli"),
        (col("__det") - col("seasonal_milli")).as("remainder_milli"))
  }

  /** R146 + R147: the distribution-free trend kit over a per-key tick
    * series — Theil–Sen slope and the Mann–Kendall test, both exact:
    *
    *   R146  slope_milli = type-1 median (x_⌈m/2⌉ of the sorted list)
    *         of Δx·1000 // Δt over all position pairs i < j with
    *         Δt > 0 (equal-ts pairs are skipped — stated; // is
    *         TRUNCATING division toward zero, DuckDB's integer `//`,
    *         applied per pair BEFORE the median so the estimate is a
    *         median of integers, the contract a SQL engine replays)
    *   R147  S = Σ_{i<j} sign(x_j − x_i); with the tie-corrected
    *         variance VAR(S)·18 = n(n−1)(2n+5) − Σ_v t_v(t_v−1)(2t_v+5)
    *         the continuity-corrected z² ships ×10⁶:
    *         z²_ppm = (|S|−1)²·18·10⁶ div VAR18  (0 when S = 0, NULL
    *         when every value is tied)
    *
    * Pairwise work is O(ticks²) per key on TICK-BOUNDED series (the
    * R130/R142 aggregated-series posture — ticks are months/days, not
    * rows; raw-row trend tests belong to R123/R138 on the grid). One
    * (key) shuffle, per-key walk, keys independent.
    *
    * @return (key, n, n_pairs, s_stat, slope_milli, z2_ppm)
    */
  def trendTest(series: DataFrame, key: Column, id: Column, tsSec: Column,
                x: Column): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    val typed = series.select(key.cast("long"), id.cast("long"),
      tsSec.cast("long"), x.cast("long")).as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .mapGroups { (k, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
        val n = sorted.size
        var s = 0L
        val slopes = scala.collection.mutable.ArrayBuffer.empty[Long]
        for (i <- 0 until n; j <- (i + 1) until n) {
          val (_, _, ti, xi) = sorted(i)
          val (_, _, tj, xj) = sorted(j)
          s += java.lang.Long.signum(xj - xi)
          // TRUNCATING division toward zero — DuckDB's `//` (the R130
          // contract); Δt > 0 by the sort, so only Δx carries sign
          if (tj != ti)
            slopes += (xj - xi) * 1000L / (tj - ti)
        }
        val m = slopes.size
        val slope =
          if (m == 0) None
          else Some(slopes.sorted.apply((m + 1) / 2 - 1)) // type-1 median
        def tieTerm(vs: Seq[Long]): Long = vs.groupBy(identity).values
          .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) })
          .sum
        val var18 = n.toLong * (n - 1) * (2L * n + 5) -
          tieTerm(sorted.map(_._4))
        val z2 =
          if (s == 0) Some(0L)
          else if (var18 <= 0) None
          else {
            val a = BigInt(math.abs(s) - 1)
            Some((a * a * 18 * 1000000 / var18).toLong)
          }
        (k, n.toLong, m.toLong, s, slope, z2)
      }
      .toDF("key", "n", "n_pairs", "s_stat", "slope_milli", "z2_ppm")
  }

  /** R148 + R149: randomness screens over a per-key tick series — the
    * complement of R147 (Mann–Kendall asks "is there a monotone trend";
    * these ask "is the series even random"):
    *
    *   R148  Wald–Wolfowitz runs test on the DIFFERENCED series: signs
    *         of x_{t+1} − x_t with zero diffs SKIPPED (stated), R = the
    *         number of sign runs, m = n₊·n₋, N = n₊+n₋; since
    *         E[R] = 1 + 2m/N and Var[R] = 2m(2m−N)/(N²(N−1)), the N²
    *         cancels into
    *         z²_ppm = (RN − N − 2m)²·(N−1)·10⁶ div (2m(2m−N))
    *         — exactly rational; NULL when a sign is absent or the
    *         variance term is ≤ 0.
    *   R149  turning-points test: TP = count of STRICT local extrema
    *         (x_{t−1} < x_t > x_{t+1} or mirrored — plateaus don't
    *         turn, stated); E[TP] = 2(n−2)/3 and Var[TP] = (16n−29)/90
    *         combine — (TP−E)² = (3TP−2(n−2))²/9 times 90/(16n−29) —
    *         into z²_ppm = (3·TP − 2(n−2))²·10·10⁶ div (16n−29);
    *         NULL when n < 3.
    *
    * Same per-key walk posture as [[trendTest]]; tick-bounded series.
    *
    * @return (key, n, n_pos, n_neg, n_runs, runs_z2_ppm, n_turning,
    *         turning_z2_ppm)
    */
  def randomnessTest(series: DataFrame, key: Column, id: Column,
                     tsSec: Column, x: Column): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    val typed = series.select(key.cast("long"), id.cast("long"),
      tsSec.cast("long"), x.cast("long")).as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .mapGroups { (k, rows) =>
        val xs = rows.toSeq.sortBy(r => (r._3, r._2)).map(_._4)
        val n = xs.size
        val signs = xs.sliding(2).collect {
          case Seq(a, b) if a != b => if (b > a) 1 else -1
        }.toSeq
        val nPos = signs.count(_ > 0).toLong
        val nNeg = signs.count(_ < 0).toLong
        val runs =
          if (signs.isEmpty) 0L
          else 1L + signs.sliding(2).count {
            case Seq(a, b) => a != b
            case _ => false
          }
        val bigN = nPos + nNeg
        val m = nPos * nNeg
        val runsZ2 =
          if (nPos == 0 || nNeg == 0 || 2 * m <= bigN) None
          else {
            val num = BigInt(runs * bigN - bigN - 2 * m)
            Some((num * num * (bigN - 1) * 1000000 /
              (BigInt(2) * m * (2 * m - bigN))).toLong)
          }
        val tp = (1 until n - 1).count(i =>
          (xs(i - 1) < xs(i) && xs(i) > xs(i + 1)) ||
            (xs(i - 1) > xs(i) && xs(i) < xs(i + 1))).toLong
        val tpZ2 =
          if (n < 3) None
          else {
            val num = BigInt(3 * tp - 2 * (n - 2))
            Some((num * num * 10 * 1000000 / (16L * n - 29)).toLong)
          }
        (k, n.toLong, nPos, nNeg, runs, runsZ2, tp, tpZ2)
      }
      .toDF("key", "n", "n_pos", "n_neg", "n_runs", "runs_z2_ppm",
        "n_turning", "turning_z2_ppm")
  }

  /** Reference seasonal-Holt walk (specs only):
    * xs → (phase, s, level, trend, forecast). */
  def holtSeasonalRef(xs: Seq[Long], period: Int, alphaPpm: Long,
                      betaPpm: Long): Seq[(Int, Long, Long, Long, Long)] = {
    val meanAll = xs.map(_ * 1000L).sum / xs.size
    val s = xs.zipWithIndex.groupBy(_._2 % period + 1)
      .map { case (p, g) => p -> (g.map(_._1 * 1000L).sum / g.size - meanAll) }
    var l = Long.MinValue
    var b = 0L
    xs.zipWithIndex.map { case (v, i) =>
      val p = i % period + 1
      val d = v * 1000L - s(p)
      if (l == Long.MinValue) { l = d; b = 0L }
      else {
        val lPrev = l
        l = (alphaPpm * d + (1000000L - alphaPpm) * (l + b)) / 1000000L
        b = (betaPpm * (l - lPrev) + (1000000L - betaPpm) * b) / 1000000L
      }
      (p, s(p), l, b, l + b + s.getOrElse((i + 1) % period + 1, 0L))
    }
  }

  /** Geometric adstock (advertising carryover; Broadbent 1979 — public
    * marketing-science literature): today's effective pressure is
    * today's spend plus a decayed tail of history,
    *
    *   a₁ = x₁·1000;   aₜ = xₜ·1000 + (λ·aₜ₋₁) div 10⁶   [milli]
    *
    * — NOT the EWMA convex blend (R129 normalizes by 1−λ; adstock
    * ACCUMULATES, which is the point: two spikes close together stack).
    * Per-step floor division on nonneg operands keeps the walk exactly
    * replayable; same execution shape as R129 — one (key) shuffle, each
    * key walks its own (ts, id)-ordered rows with one long of state.
    *
    * @param lambdaPpm decay per step in ppm (0 = no carryover)
    * @return (key, id, ts_sec, x, adstock_milli)
    */
  def adstock(series: DataFrame, key: Column, id: Column, tsSec: Column,
              x: Column, lambdaPpm: Long): DataFrame = {
    require(lambdaPpm >= 0 && lambdaPpm < 1000000, s"lambdaPpm: $lambdaPpm")
    val spark = series.sparkSession
    import spark.implicits._
    val typed = series.select(key.cast("long"), id.cast("long"),
      tsSec.cast("long"), x.cast("long")).as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroups { (k, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
        var a = 0L
        var first = true
        sorted.map { case (_, eid, t, v) =>
          a = if (first) { first = false; v * 1000L }
              else v * 1000L + lambdaPpm * a / 1000000L
          (k, eid, t, v, a)
        }
      }
      .toDF("key", "id", "ts_sec", "x", "adstock_milli")
  }

  /** Reference walk (specs only). */
  def adstockRef(xs: Seq[Long], lambdaPpm: Long): Seq[Long] =
    xs.tail.scanLeft(xs.head * 1000L)((a, v) =>
      v * 1000L + lambdaPpm * a / 1000000L)

  /** Single binary-segmentation changepoint — WHERE does each series
    * break, exactly? R61's CUSUM says THAT a shift happened; this picks
    * the boundary: the split b (1 ≤ b < n) maximizing the classic
    * CUSUM-type statistic |S_b·n − S·b| (the prefix sum's deviation from
    * the uniform ramp, cross-multiplied so it stays an exact integer —
    * equivalent to maximizing the weighted mean separation
    * b(n−b)·|mean_left − mean_right|). Ties break on the SMALLER b
    * (stated); segment means report in sign-carried milli.
    *
    * Scale shape: the per-key series is grid-sized by construction
    * (callers aggregate to buckets first), so the prefix-sum window and
    * the max_by argmax run on grid rows; one (key) shuffle total.
    *
    * @param series (key, pos, x) — pos the order column, x integral
    * @return (key, n, split_pos, score, mean_left_milli,
    *         mean_right_milli) — series with n < 2 are absent (no
    *         interior split exists)
    */
  def binarySegment(series: DataFrame, key: Column, pos: Column,
                    x: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = series.select(key.as("key"), pos.cast("long").as("pos"),
      x.cast("long").as("x"))
    val w = Window.partitionBy(col("key")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("key"))
    val pre = o
      .withColumn("sb", sum(col("x")).over(w))
      .withColumn("b", count(lit(1)).over(w))
      .withColumn("s", sum(col("x")).over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("b") < col("n")) // interior boundaries only
      .withColumn("score", abs(col("sb") * col("n") - col("s") * col("b")))
    def milliMean(sc: String, nc: String) =
      expr(s"""CASE WHEN $sc >= 0 THEN ($sc * 1000) div $nc
              |ELSE -((-($sc * 1000)) div $nc) END""".stripMargin)
    pre.groupBy(col("key"))
      .agg(max(col("n")).as("n"), max(col("s")).as("__s"),
        max_by(struct(col("pos").as("p"), col("score").as("sc"),
            col("sb").as("lsum"), col("b").as("lb")),
          struct(col("score"), -col("pos"))).as("__m"))
      .select(col("key"), col("n"), col("__m.p").as("split_pos"),
        col("__m.sc").as("score"),
        milliMean("__m.lsum", "__m.lb").as("mean_left_milli"),
        expr("""CASE WHEN __s - __m.lsum >= 0
               |  THEN ((__s - __m.lsum) * 1000) div (n - __m.lb)
               |  ELSE -((-((__s - __m.lsum) * 1000)) div (n - __m.lb))
               |END""".stripMargin).as("mean_right_milli"))
  }
}
