package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance for distributive aggregates (SUM/COUNT)
  * over a soft-delete replica.
  *
  * A materialized `GROUP BY` view over a 100 TB fact table must not be
  * recomputed because a 10⁵-row delta arrived. Both aggregates are
  * self-maintainable from (old row, new row) pairs: retract the OLD
  * contribution of every staged key — looked up from the pre-merge
  * replica by PK, a |delta|-sized semi-join, never a scan — and add the
  * new row's contribution unless it is soft-deleted. The state update is
  * then a full-outer join of two tiny grouped adjustment sets.
  *
  * Exactness: the value is summed as DECIMAL(12,2), so retract-then-add
  * is associative with no float drift — maintained state is bit-equal to
  * a recompute (the gate query's oracle IS the recompute).
  */
object Ivm {
  /** The view definition this maintainer serves: non-deleted rows grouped
    * by `groupCol`, decimal-exact SUM(valueCol) + COUNT(*).
    */
  def sumCountView(df: DataFrame, groupCol: String, valueCol: String,
                   isDeletedCol: String = "is_deleted"): DataFrame =
    df.filter(col(isDeletedCol) === "N")
      .groupBy(col(groupCol))
      .agg(sum(d12(col(valueCol))).as("sum_val"),
        count(lit(1)).as("n_rows"))

  private def d12(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Apply a deduped CDC delta to a [[sumCountView]] state.
    *
    * @param state  current view state (groupCol, sum_val, n_rows)
    * @param target pre-merge replica (pk..., groupCol, valueCol, isDeleted)
    * @param staged deduped delta, same schema — every PK at most once
    */
  def maintainSumCount(state: DataFrame, target: DataFrame, staged: DataFrame,
                       pk: Seq[String], groupCol: String, valueCol: String,
                       isDeletedCol: String = "is_deleted"): DataFrame = {
    val keys = staged.select(pk.map(col): _*).distinct()
    val retract = target
      .join(keys, pk, "left_semi")
      .filter(col(isDeletedCol) === "N")
      .select(col(groupCol), (d12(col(valueCol)) * -1).as("adj"), lit(-1L).as("n_adj"))
    val add = staged
      .filter(col(isDeletedCol) === "N")
      .select(col(groupCol), d12(col(valueCol)).as("adj"), lit(1L).as("n_adj"))
    val adjustments = retract.unionByName(add)
      .groupBy(col(groupCol))
      .agg(sum(col("adj")).as("d_sum"), sum(col("n_adj")).as("d_n"))
    state.join(adjustments, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("sum_val"), lit(0).cast(DecimalType(12, 2))) +
          coalesce(col("d_sum"), lit(0).cast(DecimalType(12, 2)))).as("sum_val"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n_rows"))
      .filter(col("n_rows") > 0) // groups whose last row left drop from the view
  }
}
