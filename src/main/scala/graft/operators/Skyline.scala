package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — the rows no other row dominates on
  * two maximize dimensions. Row p is dominated iff some q has q.x ≥ p.x
  * AND q.y ≥ p.y with strict inequality on at least one dim; equal
  * (x, y) points do not dominate each other, so every copy of a frontier
  * point survives. The "best trade-offs" query behind supplier scoring,
  * price/performance shortlists, and multi-objective config search —
  * the piece a plain ORDER BY can never answer because the frontier is
  * not a prefix of any single order.
  *
  * Never the quadratic all-pairs NOT-EXISTS and never a data-sized
  * single-partition window. The classic sort-based skyline needs the
  * suffix max of y over strictly-greater x, which decomposes exactly
  * like [[Ranking.rankExact]]'s two-stage rank:
  *   1. range-bucket x from a broadcast min/max (pure column arithmetic);
  *   2. per-bucket max(y) — one hash aggregate — then a suffix max over
  *      the BUCKET maxima (the only unpartitioned window, ≤ buckets+1
  *      metadata rows, broadcast back);
  *   3. within each bucket a RANGE-frame window (partitioned BY bucket)
  *      supplies the strictly-greater-x part, and a (bucket, x) window
  *      supplies the same-x max for the tie rule.
  * A row survives iff no strictly-greater-x row reaches its y and no
  * same-x row exceeds its y. Every data-sized operation is partitioned,
  * so the frontier of a 10⁹-row table parallelizes like any hash agg.
  *
  * Value-skew caveat (same as rankExact): rows sharing one x value land
  * in one bucket; a single dominant x bounds stage-3 parallelism by
  * that bucket — never worse than the global-window form this replaces.
  */
object Skyline {
  /** Filter `df` to its 2-D maximize-maximize skyline.
    *
    * @param x primary dim (cast to long; cast must preserve order)
    * @param y secondary dim (cast to long)
    * @param buckets range-bucket budget for the x axis; the metadata
    *                table stage 2 windows over is ≤ buckets+1 rows
    */
  def skyline2d(df: DataFrame, x: Column, y: Column,
                buckets: Int = 4096): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = df.withColumn("__x", x.cast("long"))
      .withColumn("__y", y.cast("long"))
    val stats = base.agg(min(col("__x")).as("__mn"), max(col("__x")).as("__mx"))
    val bucketed = base.crossJoin(broadcast(stats))
      .withColumn("__bkt",
        expr(s"(__x - __mn) div greatest(1L, (__mx - __mn) div $buckets + 1)"))
      .drop("__mn", "__mx")
    // stage 2: per-bucket y maxima, suffix-max over STRICTLY higher buckets
    val perBucket = bucketed.groupBy(col("__bkt")).agg(max(col("__y")).as("__my"))
    val wHigher = Window.orderBy(col("__bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket.select(col("__bkt"),
      max(col("__my")).over(wHigher).as("__hi"))
    // stage 3: strictly-greater x within the bucket via a RANGE frame
    // (ORDER BY x DESC, 1 PRECEDING = x' >= x+1), same-x max for ties
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("__x").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(col("__bkt"), col("__x"))
    bucketed.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("__sup",
        greatest(coalesce(col("__hi"), lit(Long.MinValue)),
          coalesce(max(col("__y")).over(wIn), lit(Long.MinValue))))
      .withColumn("__eq", max(col("__y")).over(wEq))
      .filter(col("__sup") < col("__y") && col("__eq") === col("__y"))
      .select(df.columns.map(col): _*)
  }
}
