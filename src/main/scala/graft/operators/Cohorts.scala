package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators over event streams: ordered funnels and
  * cohort retention — the two standard product-analytics reports,
  * expressed as declarative multi-stage aggregations (no self-join
  * explosion, no per-user collect).
  */
object Cohorts {
  /** Per-user earliest STRICTLY-ORDERED completion time of each funnel
    * stage: t₁ = min ts of stage 1; tᵢ = min ts of stage i with
    * ts > tᵢ₋₁. A user who performs stage 2 only before stage 1 has
    * t₂ = null — order matters, which is what distinguishes a funnel
    * from three filters.
    *
    * Shape: one left join + groupBy per stage, ALL keyed on the user
    * column — after the first exchange the remaining stages reuse the
    * same hash partitioning (no re-shuffle of the big side), and each
    * stage's event subset is filtered before its join. Stage rows carry
    * previous stage times through the groupBy (functionally dependent on
    * the user key).
    */
  def funnelTimes(events: DataFrame, user: String, typeCol: String,
                  tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    var acc = events.select(col(user)).distinct()
    var prev: Option[String] = None
    stages.zipWithIndex.foreach { case (st, i) =>
      val ti = s"t${i + 1}"
      val si = events.filter(col(typeCol) === st)
        .select(col(user).as("__u"), col(tsCol).as("__ts"))
      val cond = acc(user) === si("__u") &&
        prev.map(p => col("__ts") > col(p)).getOrElse(lit(true))
      val grpCols = col(user) +: (1 to i).map(j => col(s"t$j"))
      acc = acc.join(si, cond, "left")
        .groupBy(grpCols: _*)
        .agg(min(col("__ts")).as(ti))
      prev = Some(ti)
    }
    acc
  }

  /** Funnel summary: one row per stage with the count of users whose
    * ordered completion reaches it. Monotone by construction
    * (tᵢ non-null requires tᵢ₋₁ non-null).
    */
  def funnelSummary(events: DataFrame, user: String, typeCol: String,
                    tsCol: String, stages: Seq[String]): DataFrame = {
    val times = funnelTimes(events, user, typeCol, tsCol, stages)
    // SUM over an empty relation is NULL — an empty event set must report
    // zero completions per stage, not null
    val counts = times.agg(
      count(lit(1)).as("n_users"),
      stages.indices.map(i =>
        coalesce(sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)), lit(0L))
          .as(s"n${i + 1}")): _*)
    val stageRows = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).cast("long").as("stage"), lit(st).as("stage_name"),
        col(s"n${i + 1}").as("n_users"))
    }
    counts.select(explode(array(stageRows: _*)).as("s"))
      .select(col("s.stage"), col("s.stage_name"), col("s.n_users"))
      .orderBy(col("stage"))
  }

  /** Cohort retention matrix: users are assigned to the cohort of the
    * period (e.g. week) of their FIRST event; each (cohort, offset) cell
    * counts the distinct users of that cohort active `offset` periods
    * later. `periodCol` must be an integral period index (the caller
    * picks the calendar: epoch-week, epoch-day, billing month...).
    *
    * Two aggregations and one join, all keyed on the user column;
    * the (user, period) distinct pre-aggregation keeps the join input
    * at one row per user-period, not per event.
    */
  /** Trailing-window distinct users per period (rolling reach). Sliding
    * COUNT(DISTINCT) has no window-function form, so each (user, period)
    * activity row is fanned out to the ≤`window` periods it contributes
    * to — a BOUNDED explode (expansion = window length, not data size) —
    * and one hash aggregate counts distincts per target period. Reported
    * only for periods that occur in the data. At scale this beats the
    * range self-join: the fan-out is map-side and the single shuffle
    * carries (user, target_period) pairs already deduplicated per period.
    */
  def rollingDistinct(events: DataFrame, user: String, periodCol: Column,
                      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val act = events.select(col(user), periodCol.cast("long").as("period")).distinct()
    val periods = act.select(col("period")).distinct()
    act.select(col(user),
        explode(sequence(col("period"), col("period") + (window - 1)))
          .as("target_period"))
      .join(periods.withColumnRenamed("period", "target_period"),
        Seq("target_period"), "left_semi")
      .groupBy(col("target_period").as("period"))
      .agg(countDistinct(col(user)).as("n_distinct"))
  }

  def cohortRetention(events: DataFrame, user: String,
                      periodCol: Column): DataFrame = {
    val act = events.select(col(user), periodCol.cast("long").as("period")).distinct()
    val cohort = act.groupBy(col(user)).agg(min(col("period")).as("cohort_period"))
    act.join(cohort, Seq(user))
      .groupBy(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .agg(countDistinct(col(user)).as("n_users"))
      .orderBy(col("cohort_period"), col("period_offset"))
  }
}
