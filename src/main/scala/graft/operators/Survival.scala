package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R119: Kaplan–Meier survival estimation with right-censoring — the
  * churn/retention curve an Oracle-replica analyst computes from any
  * (started, last seen) activity table: "what fraction of a cohort is
  * still alive after t days, given that some subjects are still active
  * and must not be counted as churned" (Kaplan & Meier 1958; standard
  * estimator, public literature).
  *
  *   S(t) = Π_{tᵢ ≤ t} (n_i − d_i) / n_i
  *
  * with n_i = at-risk count just before tᵢ (everyone whose observed
  * duration ≥ tᵢ) and d_i = events AT tᵢ; censored subjects leave the
  * risk set without contributing an event. Fixed-point contract: the
  * product is carried in ppm and TRUNCATES at every step,
  * s ← s·(n−d) div n — like the EWMA recursion (R116) there is no
  * closed form once per-step flooring compounds, so the oracle replays
  * the identical recursion as a recursive CTE and the result is
  * bit-identical in any engine.
  *
  * Scale posture: the data-sized work is ONE aggregation to the
  * (group, duration) grid — d and c counts — which is bounded by
  * #groups × time-domain, metadata-sized (a 10-year daily horizon is
  * ~3.7k rows per group). The at-risk suffix sum and the product walk
  * run on that grid only: the window is partitioned per group over grid
  * rows, and the per-group sequential product is a flatMapGroups walk
  * over ≤ time-domain rows. Nothing downstream of the first aggregate
  * is data-sized.
  */
object Survival {
  /** Kaplan–Meier curve per group from one row per subject.
    *
    * @param subjects one row per subject
    * @param group    cohort/stratum key
    * @param duration observed duration in integral units (days)
    * @param observed true = the terminal event happened (churn seen);
    *                 false = right-censored (still active at cutoff)
    * @return (grp, t, n_risk, n_events, n_censored, surv_ppm) — one row
    *         per (group, distinct duration), survival AFTER time t
    *
    * Null convention: a subject with a null duration or null observed
    * flag carries no observation and is EXCLUDED up front (a null t
    * would otherwise become a grid row and blow the non-nullable
    * encoder; a null observed must not be silently read as censored).
    */
  def kaplanMeier(subjects: DataFrame, group: Column, duration: Column,
                  observed: Column): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    val grid = subjects
      .select(group.cast("string").as("grp"), duration.cast("long").as("t"),
        observed.cast("boolean").as("obs"))
      .filter(col("t").isNotNull && col("obs").isNotNull)
      .groupBy(col("grp"), col("t"))
      .agg(sum(when(col("obs"), 1L).otherwise(0L)).as("d"),
        sum(when(col("obs"), 0L).otherwise(1L)).as("c"))
    // at-risk: everyone still under observation at t — suffix sum over
    // the per-group time grid (grid rows only, never subject rows)
    val atRisk = Window.partitionBy(col("grp")).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = grid.withColumn("n_risk", sum(col("d") + col("c")).over(atRisk))
    withRisk.select(col("grp"), col("t"), col("n_risk"), col("d"), col("c"))
      .as[(String, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, rows) =>
        val sorted = rows.toSeq.sortBy(_._2)
        var s = 1000000L
        sorted.map { case (_, t, n, d, c) =>
          s = s * (n - d) / n // d ≤ n by construction; d = 0 is exact identity
          (g, t, n, d, c, s)
        }
      }
      .toDF("grp", "t", "n_risk", "n_events", "n_censored", "surv_ppm")
  }

  /** Reference recursion (specs only): (t, n, d) sorted by t → surv_ppm. */
  def kaplanMeierRef(steps: Seq[(Long, Long, Long)]): Seq[Long] =
    steps.scanLeft(1000000L) { case (s, (_, n, d)) => s * (n - d) / n }.tail

  /** R132: two-sample log-rank test per stratum — "do sides A and B
    * have the same survival curve", the A/B companion of [[kaplanMeier]]
    * (Mantel 1966; standard form, public literature). At each event
    * time t: observed A-events d_a vs the hypergeometric expectation
    * E_a = d·n_a/n and variance V = d·n_a·(n−n_a)·(n−d)/(n²·(n−1));
    * χ² = (Σd_a − ΣE_a)² / ΣV on 1 dof.
    *
    * Exactness contract: E and V are floored PER EVENT TIME in
    * micro-units (e_micro = d·n_a·10⁶ div n, v analogous — the stated
    * truncation both engines replay; all operands nonnegative so floor
    * ≡ truncate), then χ² is ONE more nonnegative floor division in
    * milli. NULL when ΣV = 0 (no usable event times). Headroom:
    * the V numerator is ≤ n⁴·10⁶ — DECIMAL(38,0) holds strata up to
    * ~10⁷ subjects; pre-stratify beyond.
    *
    * Same grid posture as KM: one aggregate to the (grp, t) grid,
    * suffix-sum windows over grid rows only.
    *
    * @return (grp, n_a, n_b, o_a, e_a_micro, v_micro, chi2_milli)
    */
  def logRank(subjects: DataFrame, group: Column, side: Column,
              duration: Column, observed: Column): DataFrame = {
    val base = subjects
      .select(group.cast("string").as("grp"), side.cast("boolean").as("s"),
        duration.cast("long").as("t"), observed.cast("boolean").as("obs"))
      .filter(col("t").isNotNull && col("obs").isNotNull &&
        col("s").isNotNull)
    logRankFromGrid(base.groupBy(col("grp"), col("t"))
      .agg(count(lit(1)).as("arr"),
        sum(when(col("s"), 1L).otherwise(0L)).as("arr_a"),
        sum(when(col("obs"), 1L).otherwise(0L)).as("d"),
        sum(when(col("s") && col("obs"), 1L).otherwise(0L)).as("d_a")))
  }

  /** The log-rank tail from a pre-aggregated (grp, t, arr, arr_a, d,
    * d_a) grid — shared with the streaming monitor (X33); side totals
    * are re-derived from the grid itself.
    */
  def logRankFromGrid(grid: DataFrame): DataFrame = {
    val wSuf = Window.partitionBy(col("grp")).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = grid
      .withColumn("n", sum(col("arr")).over(wSuf))
      .withColumn("n_a", sum(col("arr_a")).over(wSuf))
      .filter(col("d") >= 1)
      .withColumn("e_micro",
        expr("CAST(d AS DECIMAL(38,0)) * n_a * 1000000 div n"))
      .withColumn("v_micro", expr(
        """CASE WHEN n <= 1 THEN CAST(0 AS DECIMAL(38,0))
          |ELSE CAST(d AS DECIMAL(38,0)) * n_a * (n - n_a) * (n - d)
          |  * 1000000 div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))
          |END""".stripMargin))
    val totals = grid.groupBy(col("grp"))
      .agg(sum(col("arr_a")).as("n_a"),
        sum(col("arr") - col("arr_a")).as("n_b"))
    totals.join(
        ev.groupBy(col("grp"))
          .agg(sum(col("d_a")).as("o_a"),
            sum(col("e_micro")).as("__e"), sum(col("v_micro")).as("__v")),
        Seq("grp"), "left")
      .select(col("grp"), col("n_a"), col("n_b"),
        coalesce(col("o_a"), lit(0L)).as("o_a"),
        coalesce(col("__e"), lit(0L)).cast("long").as("e_a_micro"),
        coalesce(col("__v"), lit(0L)).cast("long").as("v_micro"),
        when(coalesce(col("__v"), lit(0L)) === 0, lit(null))
          .otherwise(expr(
            """CAST((CAST(coalesce(o_a, 0) AS DECIMAL(38,0)) * 1000000 - __e)
              | * (CAST(coalesce(o_a, 0) AS DECIMAL(38,0)) * 1000000 - __e)
              | * 1000 div (__v * 1000000) AS BIGINT)""".stripMargin))
          .as("chi2_milli"))
  }
}
