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
