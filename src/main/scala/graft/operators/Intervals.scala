package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands and interval coalescing — the two classic "stitch
  * ranges back together" patterns: consecutive-run detection over
  * discrete periods (activity streaks, sequence gaps) and union of
  * overlapping [start, end] intervals (session spans, validity windows,
  * maintenance windows). Both are per-key window pipelines — the only
  * shuffle is the key partition, each key's series sorts within its
  * partition, and all arithmetic stays integral.
  */
object Intervals {
  /** Islands of CONSECUTIVE periods per key. The island identity is the
    * textbook `period − row_number()` trick: within a key's distinct
    * sorted periods, consecutive runs share a constant difference.
    *
    * @return (keys..., start_period, end_period, n_periods)
    */
  def islands(df: DataFrame, keyCols: Seq[String], periodCol: Column): DataFrame = {
    val keys = keyCols.map(col)
    val act = df.select((keys :+ periodCol.cast("long").as("period")): _*).distinct()
    val w = Window.partitionBy(keys: _*).orderBy(col("period"))
    act.withColumn("__grp", col("period") - row_number().over(w))
      .groupBy((keys :+ col("__grp")): _*)
      .agg(min(col("period")).as("start_period"),
        max(col("period")).as("end_period"),
        count(lit(1)).as("n_periods"))
      .drop("__grp")
  }

  /** Coalesce overlapping-or-touching [start, end] intervals per key
    * (touching = next.start ≤ running max end; closed-interval
    * semantics). A new merged interval begins where an interval's start
    * exceeds the running maximum end of everything before it — one
    * running max + one running sum over the per-key start order.
    *
    * @return (keys..., start, end, n_merged)
    */
  def coalesce(df: DataFrame, keyCols: Seq[String], startCol: Column,
               endCol: Column): DataFrame = {
    val keys = keyCols.map(col)
    val rows = df.select((keys :+ startCol.cast("long").as("start")
      :+ endCol.cast("long").as("end")): _*)
    val byStart = Window.partitionBy(keys: _*)
      .orderBy(col("start"), col("end"))
    val prevMax = byStart.rowsBetween(Window.unboundedPreceding, -1)
    val run = byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .withColumn("__new", when(col("start") > max(col("end")).over(prevMax), 1L)
        .otherwise(lit(0L)))
      // first row per key: max over the empty frame is null -> new island
      .withColumn("__new", when(max(col("end")).over(prevMax).isNull, 1L)
        .otherwise(col("__new")))
      .withColumn("__island", sum(col("__new")).over(run))
      .groupBy((keys :+ col("__island")): _*)
      .agg(min(col("start")).as("start"), max(col("end")).as("end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }

  /** R176: peak concurrency by sweep line — the capacity-planning
    * question ("how many sessions/jobs/connections were EVER open at
    * once, and when did the peak start"): each interval contributes a
    * +1 at its start and a −1 at its end (half-open [start, end), so a
    * back-to-back handoff never double-counts), the running sum over the
    * (t, delta) order is the exact concurrency profile, and the answer
    * is its max with the EARLIEST attaining time (ties: ends sort before
    * starts at the same t via delta ascending — the honest half-open
    * reading).
    *
    * Scale shape: one narrow union (2 rows per interval), one window
    * running sum per group, one max_by — a single (group) shuffle. The
    * profile never materializes wider than the event list.
    *
    * @return per group: (n_intervals, peak, peak_at)
    */
  def peakConcurrency(intervals: DataFrame, group: Column, start: Column,
                      end: Column): DataFrame = {
    val base = intervals.select(group.as("g"), start.cast("long").as("s"),
      end.cast("long").as("e"))
    val events = base.select(col("g"), col("s").as("t"), lit(1L).as("d"))
      .unionAll(base.select(col("g"), col("e").as("t"), lit(-1L).as("d")))
    val w = Window.partitionBy(col("g")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("running", sum(col("d")).over(w))
      .groupBy(col("g").as("grp"))
      .agg(expr("count(1) div 2").as("n_intervals"),
        max(col("running")).as("peak"),
        max_by(col("t"), struct(col("running"), -col("t"))).as("peak_at"))
  }
}
