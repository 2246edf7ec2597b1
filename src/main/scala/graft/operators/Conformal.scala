package graft.operators

import graft.sketches.Kmv
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals — distribution-free coverage
  * with a finite-sample guarantee (Vovk et al.; Lei et al. 2018, public
  * literature), the modern answer to "how wrong can this prediction be":
  * hold out a calibration set, take the ⌈(n+1)(1−α)⌉-th smallest
  * absolute residual as the interval half-width q, and |error| ≤ q then
  * covers fresh points with probability ≥ 1−α, NO distributional
  * assumptions. Mondrian (per-group) variant: every group gets its own
  * q, so heteroscedastic classes don't share one width.
  *
  * Exact contract: the calibration/evaluation split is the h48 hash
  * split (deterministic, leakage-free), the predictor is the
  * calibration-half integer mean (the R164 shrinkage-free special
  * case — the predictor is a PARAMETER of the method; any integer
  * predictor slots in), residuals and q are exact longs, the quantile
  * index ⌈(n+1)(1−α)⌉ is computed in ppm ceil arithmetic and clamped to
  * n (an index past the sample means an infinite interval; the clamp is
  * the stated finite surrogate). Both engines replay every step.
  *
  * Scale shape: one aggregate for the per-group predictor, one
  * [[Ranking.rankExact]] pass over calibration residuals (two-stage —
  * no single-partition sort), one join of q back to the evaluation
  * half, one coverage aggregate.
  */
object Conformal {

  /** @return per group: (group…, n_cal, n_test, q_resid, n_covered,
    *         cover_ppm) — cover_ppm ≥ (1−α)·10⁶ in expectation
    */
  def splitConformal(df: DataFrame, group: Seq[String], value: Column,
                     id: Column, alphaPpm: Long): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 999999, s"alphaPpm: $alphaPpm")
    val base = df.select(group.map(col) :+ value.cast("long").as("__v") :+
      id.as("__id") :+
      (Kmv.hash48(id) < Kmv.HashRange / 2).as("__cal"): _*)
    val cal = base.filter(col("__cal"))
    val test = base.filter(!col("__cal"))
    val enc = cal.groupBy(group.map(col): _*)
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("n_cal"))
      .withColumn("__enc",
        expr("""CASE WHEN __s >= 0 THEN __s div n_cal
               |ELSE -((-__s) div n_cal) END""".stripMargin))
      .select(group.map(col) :+ col("__enc") :+ col("n_cal"): _*)
    val resid = cal.join(enc, group)
      .withColumn("__r", abs(col("__v") - col("__enc")))
    val ranked = Ranking.rankExact(resid, group, col("__r"),
        Seq(col("__id")), "__rk")
      .withColumn("__k",
        expr(s"""least(__total,
                |  ((__total + 1) * ${1000000L - alphaPpm} + 999999)
                |    div 1000000)""".stripMargin))
    val q = ranked.filter(col("__rk") === col("__k"))
      .select(group.map(col) :+ col("__r").as("q_resid"): _*)
    test.join(enc, group).join(q, group)
      .withColumn("__cov",
        when(abs(col("__v") - col("__enc")) <= col("q_resid"), 1L)
          .otherwise(0L))
      .groupBy(group.map(col): _*)
      .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        max(col("q_resid")).as("q_resid"), sum(col("__cov")).as("n_covered"))
      .withColumn("cover_ppm", expr("n_covered * 1000000 div n_test"))
  }
}
