package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Single-server queueing replay via the Lindley recursion (Lindley
  * 1952, public literature) — the capacity question behind every intake
  * pipeline: if each arrival takes `serviceSec` to process one at a
  * time, how long does each one WAIT?
  *
  *   W₁ = 0;   Wₙ₊₁ = max(0, Wₙ + S − (tₙ₊₁ − tₙ))
  *
  * All longs, truncation-free, so the walk replays as a recursive CTE
  * bit-for-bit. Same execution shape as the R167 bucket replay: one
  * (key) shuffle, each key walks its own (ts, id)-ordered rows with one
  * long of state. The sizing use: sweep `serviceSec` over replays to
  * find the throughput where the backlog explodes — deterministic
  * what-if on real arrivals, no simulator RNG.
  */
object Queueing {

  /** @return (key, id, ts_sec, wait_sec) — wait before service starts */
  def lindleyWait(events: DataFrame, key: Column, id: Column, tsSec: Column,
                  serviceSec: Long): DataFrame = {
    require(serviceSec >= 0, s"serviceSec must be >= 0, got $serviceSec")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(key.cast("long"), id.cast("long"),
      tsSec.cast("long")).as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroups { (k, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
        var w = 0L
        var lastTs = Long.MinValue
        sorted.map { case (_, eid, t) =>
          if (lastTs != Long.MinValue)
            w = math.max(0L, w + serviceSec - (t - lastTs))
          lastTs = t
          (k, eid, t, w)
        }
      }
      .toDF("key", "id", "ts_sec", "wait_sec")
  }

  /** Reference walk (specs only). */
  def lindleyRef(ts: Seq[Long], serviceSec: Long): Seq[Long] = {
    var w = 0L
    var last = Long.MinValue
    ts.map { t =>
      if (last != Long.MinValue) w = math.max(0L, w + serviceSec - (t - last))
      last = t
      w
    }
  }
}
