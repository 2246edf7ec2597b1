package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL prefix sums — the running-total primitive behind
  * corpus growth curves (Heaps law), cumulative selection cuts, and
  * ordered-ledger balances, WITHOUT the single-partition global window
  * sort Spark's `Window.orderBy(...)` (no partition key) would run.
  *
  * Two-stage decomposition (the classic parallel scan):
  *   1. bucket each row by `ord div bucketWidth` and aggregate per-bucket
  *      partial sums — one hash aggregate, fully parallel;
  *   2. exclusive-prefix the BUCKET TOTALS (a bucket-count-sized table —
  *      the only unpartitioned window, over metadata, never data) and
  *      broadcast the offsets back;
  *   3. intra-bucket inclusive window partitioned BY BUCKET, plus the
  *      bucket's offset.
  * Every data-sized operation is partitioned; the global sequential
  * dependency is confined to the tiny bucket-total scan, which is how a
  * 10⁹-row running total survives a 1000-executor cluster.
  */
object PrefixSum {
  /** Append inclusive prefix sums over the total order `ord` (a UNIQUE
    * long — duplicate ord values would make "inclusive" ambiguous).
    *
    * @param values (name, column) pairs; each yields a `cum_<name>` long
    * @param bucketWidth ord-units per bucket; pick so bucket count stays
    *                    ≪ row count but ≫ parallelism
    */
  def prefixSums(df: DataFrame, ord: Column, values: Seq[(String, Column)],
                 bucketWidth: Long): DataFrame = {
    require(values.nonEmpty, "no value columns")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val withVals = values.foldLeft(
        df.withColumn("__ord", ord.cast("long"))
          .withColumn("__bucket",
            floor(col("__ord") / bucketWidth).cast("long"))) {
      case (d, (n, c)) => d.withColumn(s"__v_$n", c.cast("long"))
    }
    val perBucket = withVals.groupBy(col("__bucket"))
      .agg(sum(col(s"__v_${values.head._1}")).as(s"__s_${values.head._1}"),
        values.tail.map { case (n, _) => sum(col(s"__v_$n")).as(s"__s_$n") }: _*)
    // the ONLY unpartitioned window: bucket totals, metadata-sized
    val wBuckets = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket.select(
      col("__bucket") +: values.map { case (n, _) =>
        coalesce(sum(col(s"__s_$n")).over(wBuckets), lit(0L)).as(s"__off_$n")
      }: _*)
    val wIntra = Window.partitionBy(col("__bucket")).orderBy(col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withVals.join(broadcast(offsets), Seq("__bucket"))
      .select(df.columns.map(col) ++ values.map { case (n, _) =>
        (col(s"__off_$n") + sum(col(s"__v_$n")).over(wIntra)).as(s"cum_$n")
      }: _*)
  }
}
