package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: per key, a dense fixed-step bucket grid
  * between the key's first and last observation, with gaps forward-filled
  * from the most recent observed value.
  *
  * Scale shape: observations aggregate to one row per (key, bucket) with
  * map-side partials; the grid explode is narrow (one generator per key);
  * the fill is a single window pass partitioned by key — one shuffle on
  * the key total. Nothing is collected; grids of millions of buckets per
  * key stream through the window operator.
  */
object Resample {
  /** @param obs     pre-aggregated observations (key, bucket, value)
    * @return (key, bucket, value±null, filled) — `filled` carries the last
    *         observed value at or before the bucket; never null because
    *         every grid starts at the key's first observation
    */
  def forwardFill(obs: DataFrame, key: Column, bucket: Column, value: Column): DataFrame = {
    val o = obs.select(key.as("key"), bucket.as("bucket"), value.as("value"))
    val grid = o.groupBy(col("key"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("key"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(o, Seq("key", "bucket"), "left")
      .withColumn("filled", last(col("value"), ignoreNulls = true).over(w))
  }
}
