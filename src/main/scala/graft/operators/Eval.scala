package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R108: exact AUC (Mann–Whitney U) per group — the ranking-model eval
  * metric computed WITHOUT floats and WITHOUT a global rank: AUC is the
  * probability a random positive outscores a random negative, so
  *
  *   U×2 = Σ_{distinct score s} np_s · (2·negatives_below(s) + nn_s)
  *
  * (ties contribute ½ each, hence the ×2 scaling stays integral). The
  * only window runs over DISTINCT SCORES within a group — the compressed
  * domain, not the rows — after one (group, score) aggregate; the same
  * identity embeds verbatim in the SQL oracle, so the metric is
  * engine-exact down to the last tie.
  *
  * At 100 TB: one hash aggregate on (group, score), a per-group window
  * over the score domain, one 3-value reduce. No row-level sort, no
  * single-partition rank.
  */
object Eval {
  /** @param rows   one row per example
    * @param group  evaluation slice (model, segment, day, …)
    * @param label  boolean: positive class
    * @param score  model score; any orderable numeric (ties handled)
    * @return (group, n_pos, n_neg, u_stat_x2, auc_ppm) — auc_ppm =
    *         U×2 · 1e6 div (2·n_pos·n_neg); groups with no positives or
    *         no negatives report auc_ppm = null (undefined, not 0)
    */
  /** R109: calibration report — scores normalized to ppm of the max,
    * bucketed into `bins` equal-width bins; per bin the observed
    * positive rate vs the mean normalized score (a calibrated scorer
    * has them tracking). All integer ppm arithmetic.
    *
    * @return (bin, n, n_pos, pos_rate_ppm, mean_score_ppm)
    */
  def calibration(rows: DataFrame, label: Column, score: Column,
                  bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val mx = rows.agg(max(score).cast("long").as("__mx"))
    rows.select(label.as("lbl"), score.cast("long").as("scr"))
      .crossJoin(broadcast(mx))
      .withColumn("score_ppm", expr("scr * 1000000 div __mx"))
      .withColumn("bin",
        least(expr(s"score_ppm * $bins div 1000000"), lit(bins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lbl"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("score_ppm")).as("__ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 div n").as("pos_rate_ppm"),
        expr("__ssum div n").as("mean_score_ppm"))
  }

  /** R110: confusion matrix at a threshold, with exact ppm metrics —
    * TP/FP/TN/FN in one aggregate; precision, recall, and F1 as integer
    * ppm (F1 via the 2TP/(2TP+FP+FN) identity, one floor division, no
    * rational-of-rational rounding). Undefined metrics (no predicted
    * positives / no actual positives) report null.
    *
    * @return one row: (n, tp, fp, tn, fn, precision_ppm, recall_ppm,
    *         f1_ppm)
    */
  def confusionAtThreshold(rows: DataFrame, label: Column, score: Column,
                           threshold: Column): DataFrame = {
    val pred = score >= threshold
    rows.agg(
        count(lit(1)).as("n"),
        sum(when(label && pred, 1L).otherwise(0L)).as("tp"),
        sum(when(!label && pred, 1L).otherwise(0L)).as("fp"),
        sum(when(!label && !pred, 1L).otherwise(0L)).as("tn"),
        sum(when(label && !pred, 1L).otherwise(0L)).as("fn"))
      .select(col("n"), col("tp"), col("fp"), col("tn"), col("fn"),
        when(col("tp") + col("fp") === 0, lit(null))
          .otherwise(expr("tp * 1000000 div (tp + fp)")).as("precision_ppm"),
        when(col("tp") + col("fn") === 0, lit(null))
          .otherwise(expr("tp * 1000000 div (tp + fn)")).as("recall_ppm"),
        when(col("tp") * 2 + col("fp") + col("fn") === 0, lit(null))
          .otherwise(expr("tp * 2000000 div (2 * tp + fp + fn)"))
          .as("f1_ppm"))
  }

  def aucByGroup(rows: DataFrame, group: Column, label: Column,
                 score: Column): DataFrame = {
    val perScore = rows
      .select(group.as("grp"), label.as("lbl"), score.as("scr"))
      .groupBy(col("grp"), col("scr"))
      .agg(sum(when(col("lbl"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("lbl"), 1L).otherwise(0L)).as("nn"))
    val w = Window.partitionBy(col("grp")).orderBy(col("scr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("cn_below", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("grp"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (col("cn_below") * 2 + col("nn"))).as("u_stat_x2"))
      .withColumn("auc_ppm",
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
          .otherwise(expr("u_stat_x2 * 1000000 div (2 * n_pos * n_neg)")))
  }
}
