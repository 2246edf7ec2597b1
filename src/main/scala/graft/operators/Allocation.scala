package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proportional budget apportionment — the mixture arithmetic of a
  * training-data pipeline: "sample B documents, proportional to each
  * source's corpus share" (or tokens, or quality mass). Floats don't
  * work here: rounding per-source quotas independently hands out B ± a
  * few, and a billion-document run CANNOT overshoot its budget. The
  * largest-remainder (Hamilton) method is exact by construction:
  * floor quotas always sum ≤ B, and the sources with the largest
  * fractional remainders absorb the difference one unit each.
  *
  * All arithmetic is integer (quota = B·wᵢ div W, remainder = B·wᵢ mod
  * W) with the group key as the deterministic tiebreak, so the
  * allocation is reproducible across engines and runs. The input is the
  * already-aggregated per-group weight table (one row per group): the
  * single pass over data happens BEFORE this operator, which then runs
  * on the handful of group rows.
  */
object Allocation {
  /** Hamilton apportionment of `budget` units across the rows of
    * `weights`.
    *
    * @param weights one row per group
    * @param keyCol  group identity (and remainder tiebreak)
    * @param weightCol non-negative integral weight
    * @return (keyCol, weightCol, n_alloc) with sum(n_alloc) == min(budget,
    *         achievable) — a zero-weight group allocates 0.
    */
  def hamilton(weights: DataFrame, keyCol: String, weightCol: String,
               budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val all = Window.partitionBy()
    val byRem = Window.partitionBy().orderBy(col("__rem").desc, col(keyCol))
    weights
      .withColumn("__total", sum(col(weightCol)).over(all))
      .withColumn("__base", expr(s"$weightCol * $budget div __total"))
      .withColumn("__rem", (col(weightCol) * budget) % col("__total"))
      .withColumn("__extra_rank", row_number().over(byRem).cast("long"))
      .withColumn("__n_extra", lit(budget) - sum(col("__base")).over(all))
      .select(col(keyCol), col(weightCol),
        (col("__base") + when(col("__extra_rank") <= col("__n_extra"), 1L)
          .otherwise(0L)).as("n_alloc"))
  }
}
