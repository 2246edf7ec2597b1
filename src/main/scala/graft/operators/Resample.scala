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

  /** Linear-interpolation gap fill — the smoother sibling of
    * [[forwardFill]]: a gap bucket between anchors (b₁, v₁) and (b₂, v₂)
    * takes v₁ + (v₂ − v₁)·(b − b₁) div (b₂ − b₁), exact integer with ONE
    * sign-carried truncating division per gap row (both engines replay
    * it bit-for-bit); observed buckets keep their own value untouched.
    * The grid never extrapolates — it spans first..last observation, so
    * both anchors always exist.
    *
    * Same scale shape: the anchor carry is two window passes (previous
    * anchor via unbounded-preceding last, next anchor via
    * unbounded-following first) over the key-partitioned grid — one
    * shuffle on the key, no self-join.
    */
  def interpolate(obs: DataFrame, key: Column, bucket: Column,
                  value: Column): DataFrame = {
    val o = obs.select(key.as("key"), bucket.as("bucket"),
      value.cast("long").as("value"))
    val grid = o.groupBy(col("key"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("key"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val wPrev = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(o, Seq("key", "bucket"), "left")
      .withColumn("pb", last(when(col("value").isNotNull, col("bucket")),
        ignoreNulls = true).over(wPrev))
      .withColumn("pv", last(col("value"), ignoreNulls = true).over(wPrev))
      .withColumn("nb", first(when(col("value").isNotNull, col("bucket")),
        ignoreNulls = true).over(wNext))
      .withColumn("nv", first(col("value"), ignoreNulls = true).over(wNext))
      .withColumn("interp",
        when(col("value").isNotNull, col("value")).otherwise(
          col("pv") + expr("""CASE WHEN (nv - pv) * (bucket - pb) >= 0
                             |  THEN ((nv - pv) * (bucket - pb)) div (nb - pb)
                             |  ELSE -((-((nv - pv) * (bucket - pb))) div (nb - pb))
                             |END""".stripMargin)))
      .select(col("key"), col("bucket"), col("value"), col("interp"))
  }
}
