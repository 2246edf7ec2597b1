package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential pattern mining over per-key event streams — the k-length
  * contiguous-pattern counts on top of the transition machinery
  * (SURVEY R58/R58b generalizes 2-grams; this is the k-gram form).
  *
  * Semantics: events are ordered per key by `orderCol` (the
  * sessionization convention); a length-k pattern occurs at position i
  * when the k events are consecutive in that order AND every adjacent
  * gap is ≤ `maxGapSec` (the same 30-min continuity rule the transition
  * matrix uses, applied per step). Support is reported two ways:
  * occurrences (all positions) and key support (distinct keys containing
  * the pattern) — the A-priori notion.
  *
  * Scale shape: ONE window pass per key partition computes all k−1
  * leads (the window frames share the single sort), then one hash
  * aggregate on the pattern. Pattern fan-out is exactly one row per
  * event position — never an explode, never a self-join; state at 100 TB
  * is the (small) distinct-pattern space, and the per-key shuffle is the
  * same one sessionization already pays.
  */
object Sequences {

  /** Length-3 contiguous patterns. Input needs `keyCol`, `typeCol`,
    * `orderCol` (total order per key) and `tsSecCol` (epoch seconds for
    * the gap rule). Output: (t1, t2, t3, n_occurrences, n_keys).
    */
  /** R104: capped sessionization — sessions split on EITHER rule: idle
    * gap from the previous event > idleGapSec (R11's rule), OR total
    * elapsed time since the session's FIRST event > maxDurationSec (the
    * duration cap telemetry pipelines add so a browser left open all
    * week doesn't become one week-long session). The cap makes the
    * semantics truly sequential — whether event i starts a session
    * depends on which session event i−1 landed in, which depends on
    * THAT session's start — so no window frame expresses it (the
    * gaps-and-islands trick handles the idle rule only). The per-key
    * walk runs in flatMapGroups over the key-sorted group: the same
    * key-partitioned shuffle sessionization always pays, with an O(1)
    * sequential pass per key — at 100 TB keys parallelize across
    * executors and a single key's event list is the bound (document
    * your per-key volumes; a key with billions of events needs chunked
    * pre-splitting by coarse time first).
    *
    * @return (user_id, event_id, ts_sec, session_seq ∈ [1..], session
    *         start second) — one row per input event
    */
  def sessionizeCapped(events: DataFrame, user: Column, id: Column,
                       tsSec: Column, idleGapSec: Long,
                       maxDurationSec: Long): DataFrame = {
    require(idleGapSec >= 0 && maxDurationSec > 0,
      s"bad params (gap=$idleGapSec, cap=$maxDurationSec)")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(user.cast("long"), id.cast("long"),
      tsSec.cast("long")).as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroups { (u, rows) =>
        // ties break on event id: a total order both engines agree on
        val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
        var seq = 0L
        var start = Long.MinValue
        var prev = Long.MinValue
        sorted.map { case (_, eid, t) =>
          if (seq == 0L || t - prev > idleGapSec || t - start > maxDurationSec) {
            seq += 1; start = t
          }
          prev = t
          (u, eid, t, seq, start)
        }
      }
      .toDF("user_id", "event_id", "ts_sec", "session_seq",
        "session_start_sec")
  }

  def contiguousTriples(events: DataFrame, keyCol: String, typeCol: String,
                        orderCol: String, tsSecCol: String,
                        maxGapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val withLeads = events
      .withColumn("t2", lead(col(typeCol), 1).over(w))
      .withColumn("t3", lead(col(typeCol), 2).over(w))
      .withColumn("gap12", lead(col(tsSecCol), 1).over(w) - col(tsSecCol))
      .withColumn("gap23",
        lead(col(tsSecCol), 2).over(w) - lead(col(tsSecCol), 1).over(w))
    withLeads
      .filter(col("t3").isNotNull &&
        col("gap12") <= maxGapSec && col("gap23") <= maxGapSec)
      .groupBy(col(typeCol).as("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(keyCol)).as("n_keys"))
  }
}
