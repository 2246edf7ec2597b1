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
}
