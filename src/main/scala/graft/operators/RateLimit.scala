package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Token-bucket rate-limit REPLAY: run the standard admission policy
  * over a logged event history and mark, exactly, which events a
  * per-key limiter would have admitted — the audit behind "what would
  * this quota have done to last month's traffic" and the enforcement
  * twin of the pipeline's ingest throttles (the reference's scheduled
  * batch loads are the same shape with a cron for a bucket;
  * reference: README.md:24).
  *
  * Exact integer contract: the bucket carries milli-tokens. Per event in
  * the per-key (ts, id) total order:
  *
  *   tokens = min(capacity, tokens + (ts − lastTs)·refillPerSec)   [milli]
  *   admit  = tokens ≥ cost;  admitted ⇒ tokens −= cost
  *
  * Every quantity is a long and every step truncation-free, so the walk
  * replays bit-for-bit as a recursive CTE. Same execution shape as the
  * R129 EWMA walk: ONE (key) shuffle, then each key walks its own rows —
  * the per-key recursion never leaves the executor, state is two longs.
  */
object RateLimit {

  /** @param events       rows to replay
    * @param key          limiter key (per-user / per-tenant buckets)
    * @param id           tie-break within equal timestamps
    * @param tsSec        event time, integer seconds
    * @param capMilli     bucket capacity in milli-tokens (also the fill
    *                     at each key's first event — a fresh bucket)
    * @param refillMilli  refill per second in milli-tokens
    * @param costMilli    cost per event in milli-tokens
    * @return (key, id, ts_sec, admitted, tokens_milli) — tokens AFTER
    *         the event's admit/reject decision
    */
  def tokenBucket(events: DataFrame, key: Column, id: Column, tsSec: Column,
                  capMilli: Long, refillMilli: Long,
                  costMilli: Long): DataFrame = {
    require(capMilli >= 1, s"capMilli must be >= 1, got $capMilli")
    require(refillMilli >= 0, s"refillMilli must be >= 0, got $refillMilli")
    require(costMilli >= 1, s"costMilli must be >= 1, got $costMilli")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(key.cast("long"), id.cast("long"),
      tsSec.cast("long")).as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroups { (k, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
        var tokens = capMilli
        var lastTs = Long.MinValue
        sorted.map { case (_, eid, t) =>
          if (lastTs != Long.MinValue)
            tokens = math.min(capMilli, tokens + (t - lastTs) * refillMilli)
          lastTs = t
          val admitted = tokens >= costMilli
          if (admitted) tokens -= costMilli
          (k, eid, t, admitted, tokens)
        }
      }
      .toDF("key", "id", "ts_sec", "admitted", "tokens_milli")
  }

  /** Reference walk (specs only). */
  def tokenBucketRef(ts: Seq[Long], capMilli: Long, refillMilli: Long,
                     costMilli: Long): Seq[(Boolean, Long)] = {
    var tokens = capMilli
    var lastTs = Long.MinValue
    ts.map { t =>
      if (lastTs != Long.MinValue)
        tokens = math.min(capMilli, tokens + (t - lastTs) * refillMilli)
      lastTs = t
      val admitted = tokens >= costMilli
      if (admitted) tokens -= costMilli
      (admitted, tokens)
    }
  }
}
