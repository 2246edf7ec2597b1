package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance for self-maintainable aggregates over a
  * soft-delete replica: SUM/COUNT are maintained directly, AVG is derived
  * from them ([[Ivm.withAvg]]). MIN/MAX are deliberately NOT offered: they
  * are not self-maintainable from deltas alone ([[Ivm.maintainMinMax]]
  * documents the contract and throws).
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

  /** AVG over the maintained view — derived, never separately maintained:
    * avg = sum_val / n_rows holds exactly on every state the maintainer
    * can produce, so maintaining a third aggregate would only add a place
    * to drift. Emitted at DECIMAL(18,6) (exact decimal division, then one
    * well-defined HALF_UP rounding) so maintained-then-derive equals
    * recompute-then-derive bit-for-bit.
    */
  def withAvg(state: DataFrame): DataFrame =
    state.withColumn("avg_val",
      (col("sum_val") / col("n_rows")).cast(DecimalType(18, 6)))

  /** MIN/MAX maintenance is rejected by contract. Deleting (or updating
    * away) the current extremum of a group requires the NEXT-best value,
    * which (group, min) state does not hold — an incremental "maintainer"
    * would either silently keep a stale extremum or rescan the group,
    * which is a recompute wearing a maintenance API. Callers that need
    * maintained extrema keep auxiliary per-group state sized for their
    * deletion depth (e.g. a bounded top-k buffer — [[graft.plans.GroupedTopK]])
    * or mark the affected groups for recompute.
    */
  def maintainMinMax(aggregate: String): Nothing =
    throw new UnsupportedOperationException(
      s"IVM for $aggregate: MIN/MAX are not self-maintainable from deltas " +
        "(retracting the extremum needs the next-best value, absent from view " +
        "state). Keep bounded per-group top-k auxiliary state or recompute " +
        "affected groups.")
}
