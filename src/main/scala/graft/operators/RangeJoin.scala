package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (band/interval) join: match fact rows whose scalar value falls in
  * a dimension row's [lo, hi) interval.
  *
  * The naive plan for a non-equi join is a broadcast nested loop —
  * O(|fact|·|ranges|) comparisons, which is exactly what dies first at
  * 100 TB. Bucketing turns it into an equi-join: each range is exploded
  * into the fixed-width buckets it covers (dimension side — tiny), the
  * fact value maps to its single bucket (narrow), and the join runs on the
  * bucket key with the original interval predicate as a residual filter.
  * Shuffle volume is |fact| + Σ covered-buckets, hash-partitioned like any
  * equi-join; AQE handles bucket skew. Pick `bucketWidth` near the median
  * range width so each range covers O(1) buckets.
  */
object RangeJoin {
  /** Interval-overlap join: rows of `left` and `right` whose half-open
    * intervals [lLo, lHi) and [rLo, rHi) intersect. Both sides explode
    * into the fixed-width buckets their interval covers and equi-join on
    * the bucket; an overlapping pair co-occurs in every bucket both
    * intervals cover, so to emit it exactly once the join keeps only the
    * bucket containing max(lLo, rLo) — the overlap's left edge — instead
    * of paying a distinct over the join output.
    *
    * Empty intervals (lo ≥ hi) overlap nothing: [5,5) contains no point,
    * so it must not pair with [0,10) even though the open-interval
    * predicate alone would claim it does; both sides carry an explicit
    * non-emptiness conjunct.
    */
  def overlapJoin(left: DataFrame, lLo: Column, lHi: Column,
                  right: DataFrame, rLo: Column, rHi: Column,
                  bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(lo: Column, hi: Column): Column =
      sequence(floor(lo / bucketWidth).cast("long"), floor(hi / bucketWidth).cast("long"))
    val a = left.withColumn("__ab", explode(buckets(lLo, lHi)))
    val b = right.withColumn("__bb", explode(buckets(rLo, rHi)))
    a.join(b, col("__ab") === col("__bb") &&
        lLo < lHi && rLo < rHi &&
        lLo < rHi && rLo < lHi &&
        floor(greatest(lLo, rLo) / bucketWidth).cast("long") === col("__ab"))
      .drop("__ab", "__bb")
  }

  /** Inner-join `fact` to `ranges` on lo ≤ factVal < hi via bucketed
    * equi-join. Output: all fact columns + all ranges columns.
    */
  def bandJoin(fact: DataFrame, factVal: Column,
               ranges: DataFrame, lo: Column, hi: Column,
               bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // hi is exclusive, but including its bucket when hi lands exactly on a
    // bucket edge is harmless: the residual predicate drops the edge row
    val expanded = ranges.withColumn("__bucket",
      explode(sequence(
        floor(lo / bucketWidth).cast("long"),
        floor(hi / bucketWidth).cast("long"))))
    val keyed = fact.withColumn("__fbucket", floor(factVal / bucketWidth).cast("long"))
    keyed.join(expanded,
        col("__fbucket") === col("__bucket") && factVal >= lo && factVal < hi)
      .drop("__bucket", "__fbucket")
  }
}
