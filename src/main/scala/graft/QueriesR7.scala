package graft

import graft.PlanProbe.CkptOps
import graft.operators.{Graph, Retrieval}
import graft.sketches.Kmv
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 continuation gates (batch i): the r5+ queue — fixed-round
  * k-core peel, per-day retention curves computed from the streaming
  * day-KMV states alone, and phrase/proximity retrieval (the positional
  * second retrieval gate). Oracle discipline unchanged: integer/decimal
  * algebra only, full-tiebreak ORDER BY, md5-portable hashing.
  */
object QueriesR7 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** R76: 3-core of the co-purchase graph after 4 fixed peel rounds (see
    * [[graft.operators.Graph.kCore]]) — surviving nodes with their
    * degree inside the peeled subgraph.
    */
  def graphKcore(s: SparkSession, dir: String): DataFrame =
    Graph.kCore(QueriesR6.coPurchaseEdges(s, dir),
        k = 3, rounds = 4)
      .orderBy(col("node"))

  /** S11: per-day retention curves from the streaming day-KMV states (see
    * [[graft.sketches.Kmv.retentionFromDaySketches]]) — the drained
    * per-day sketches are the ONLY input; raw events are never re-read.
    * d = 0 rows land on exactly 1 000 000 ppm by the estimator's algebra
    * (built-in calibration).
    */
  def qKmvRetention(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val day = expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
    val act = t(s, dir, "events")
      .select(day.as("day"), Kmv.hash48(col("user_id")).as("h"))
    val daySketches = graft.streaming.Streams.streamingDayKmv(s, act, k,
      queryName = s"gate_skmvret_${System.nanoTime()}")
    Kmv.retentionFromDaySketches(daySketches, k, maxOffset = 6)
      .orderBy(col("day"), col("offset_d"))
  }

  /** T18: phrase + proximity retrieval for the query phrase
    * "window scan" (see [[graft.operators.Retrieval.phraseProximity]]):
    * exact in-order adjacent phrase hits plus minimum token distance,
    * ranked (n_phrase desc, min_dist, doc_id).
    */
  def textPhraseProx(s: SparkSession, dir: String): DataFrame =
    Retrieval.phraseProximity(t(s, dir, "documents"), "doc_id", "text",
      "window", "scan", topN = 200)

  /** D13: incremental near-dup keep-set maintenance (see
    * [[graft.dedup.Dedup.bandOwners]]/`mergeBandOwners`/`nearDupKeepSet`):
    * the band-ownership index and keep set from the FIRST HALF of the
    * corpus (ids ≤ max/2 — the id-ordered prefix, modeling time-ordered
    * ingest) are persisted to parquet; the second half is banded as a
    * delta and merged in. Min-ownership is associative and delta ids are
    * monotone, so history is never re-read, previously-kept docs never
    * revisited — and the result equals the full-batch owns-all-bands
    * rule bit-for-bit (the oracle IS `stream_near_dup`'s).
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Dedup
    val d = t(s, dir, "documents")
    val mid = d.agg((max(col("doc_id")) / 2).cast("long").as("mid"))
    val withMid = d.select(col("doc_id"), col("text"))
      .crossJoin(broadcast(mid))
    val batchA = withMid.filter(col("doc_id") <= col("mid"))
    val batchB = withMid.filter(col("doc_id") > col("mid"))
    val store = java.nio.file.Files
      .createTempDirectory("graft_dedup_inc").toString
    val bandsA = Dedup.minhashBandRows(batchA, col("doc_id"), col("text"),
      shingleWords = 3, k = 12, bands = 4)
    Dedup.bandOwners(bandsA).write.mode("overwrite")
      .parquet(s"$store/owners")
    Dedup.nearDupKeepSet(batchA.select(col("doc_id")), bandsA,
        s.read.parquet(s"$store/owners"))
      .write.mode("overwrite").parquet(s"$store/kept")
    val bandsB = Dedup.minhashBandRows(batchB, col("doc_id"), col("text"),
      shingleWords = 3, k = 12, bands = 4)
    val merged = Dedup.mergeBandOwners(s.read.parquet(s"$store/owners"),
      Dedup.bandOwners(bandsB))
    val keptB = Dedup.nearDupKeepSet(batchB.select(col("doc_id")), bandsB,
      merged)
    s.read.parquet(s"$store/kept").unionByName(keptB)
      .orderBy(col("doc_id"))
  }

  /** R77: time-weighted average (TWAP) per user — each observation holds
    * until the next one (total order (ts, event_id)), so the mean is
    * Σ(cents·dt) div Σ(dt): the irregular-sampling average a plain AVG
    * gets wrong whenever sampling density correlates with level. One
    * window pass + one aggregate; integer-exact (cents ≤ 3.3·10⁶ ×
    * dt ≤ month-seconds stays far inside int64), single-observation
    * users report NULL via NULLIF.
    */
  def qTwap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
      round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    e.withColumn("dt", lead(col("ts_sec"), 1).over(w) - col("ts_sec"))
      .filter(col("dt").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("span_sec"),
        expr("sum(cents * dt) div nullif(sum(dt), 0)").as("twap_cents"))
      .orderBy(col("user_id"))
  }

  /** R78: robust anomaly screen — per event type, median and MAD (median
    * absolute deviation) of the cents value, and the count beyond
    * 5·MAD: the outlier rule a 3σ z-score misses when the outliers
    * THEMSELVES inflate σ (median/MAD have a 50% breakdown point; the
    * mean/stddev of R54 have 0%). Interpolated medians of integers are
    * dyadic-exact in both engines (the R17 contract). Two percentile
    * passes + one flag aggregate; the 4-row median table broadcasts
    * back.
    */
  def qRobustAnomaly(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "events").select(col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val med = c.groupBy(col("event_type"))
      .agg(expr("percentile(cents, 0.5)").as("med_cents"))
    val dev = c.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("cents") - col("med_cents")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(dev, 0.5)").as("mad_cents"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("med_cents")).as("med_cents"),
        first(col("mad_cents")).as("mad_cents"),
        count(lit(1)).as("n"),
        sum(when(col("dev") > lit(5) * col("mad_cents"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** R79: first/last-touch purchase attribution — every purchase is
    * credited to the user's most recent preceding touch (click/view)
    * within 7 days under the last-touch model, and to the earliest
    * preceding touch ever under the first-touch model; no touch →
    * 'direct'. The carry is two IGNORE-NULLS window lookups over the
    * (ts, event_id)-ordered stream frame [−∞, −1] — consistent because
    * both pick the same last/first non-null row — then one small
    * aggregate per model. No self-join of the event stream.
    */
  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
      round(col("value") * 100).cast("long").as("cents"))
    val touch = when(col("event_type").isin("click", "view"), col("event_type"))
    val touchTs = when(col("event_type").isin("click", "view"), col("ts_sec"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val attributed = e
      .withColumn("last_type", last(touch, ignoreNulls = true).over(w))
      .withColumn("last_ts", last(touchTs, ignoreNulls = true).over(w))
      .withColumn("first_type", first(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("last_touch",
        when(col("last_ts").isNotNull &&
          col("ts_sec") - col("last_ts") <= 604800L, col("last_type"))
          .otherwise(lit("direct")))
      .withColumn("first_touch",
        coalesce(col("first_type"), lit("direct")))
    val byModel = (model: String, c: String) => attributed
      .groupBy(col(c).as("touch"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("revenue_cents"))
      .select(lit(model).as("model"), col("touch"), col("n_purchases"),
        col("revenue_cents"))
    byModel("first_touch", "first_touch")
      .unionByName(byModel("last_touch", "last_touch"))
      .orderBy(col("model"), col("touch"))
  }

  /** R81: multi-source BFS hop distance on the co-purchase graph (see
    * [[graft.operators.Graph.bfsHops]]) — every node within 3 hops of
    * the seed set (nodes ≡ 0 mod 97), with its minimum hop count.
    */
  def graphBfs(s: SparkSession, dir: String): DataFrame = {
    val edges = QueriesR6.coPurchaseEdges(s, dir)
    val seeds = edges.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct().filter(col("node") % 97 === 0)
    Graph.bfsHops(edges, seeds, rounds = 3).orderBy(col("node"))
  }

  /** T19: per-source quality-percentile filtering — the corpus curation
    * pass "drop each source's bottom decile by quality score". The score
    * is the T2 quality formula re-expressed in exact integer ppm, and
    * the decile cut is the integer rank rule (rank−1)·10 ≥ n — no
    * interpolated-percentile float crosses an engine boundary. Reports
    * per source: population, kept count, and the score boundary
    * (max dropped / min kept).
    */
  def corpusQualityFilter(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents")
    val scored = d.select(col("source"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
        TextFunctions.stopwordHits(col("text"), QueriesData.stopwords)
          .cast("long").as("stop_hits"))
      .withColumn("score_ppm",
        expr("(least(n_tok * 1000000 div 64, 1000000) + " +
          "least(stop_hits * 4000000 div n_tok, 1000000)) div 2"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score_ppm"), col("doc_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("kept", (col("rnk") - 1) * 10 >= col("n_src"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        max(when(!col("kept"), col("score_ppm"))).as("max_dropped_ppm"),
        min(when(col("kept"), col("score_ppm"))).as("min_kept_ppm"))
      .orderBy(col("source"))
  }

  /** X19: streaming first/last-touch attribution (see
    * [[graft.streaming.Streams.streamingAttribution]]) — per-purchase
    * attributed rows from O(1) per-user state, aggregated to the SAME
    * report (and oracle) as the batch `q_attribution`.
    */
  def streamAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
      col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val attributed = graft.streaming.Streams.streamingAttribution(s, e,
      horizonSec = 604800L, queryName = s"gate_sattr_${System.nanoTime()}")
    val byModel = (model: String, c: String) => attributed
      .groupBy(col(c).as("touch"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("revenue_cents"))
      .select(lit(model).as("model"), col("touch"), col("n_purchases"),
        col("revenue_cents"))
    byModel("first_touch", "first_touch")
      .unionByName(byModel("last_touch", "last_touch"))
      .orderBy(col("model"), col("touch"))
  }

  /** 2024-01-11 / 2024-01-21 00:00 UTC — mid-history snapshot points for
    * the events fixture (2024-01-01..30).
    */
  private val AsOfT1 = 1704931200L
  private val AsOfT2 = 1705795200L

  private def cdcEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
      col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))

  /** C26: as-of snapshot — the replica's state at 2024-01-11 rebuilt
    * from the change history alone (see [[graft.cdc.Cdc.asOfSnapshot]]):
    * per key, the latest change at or before the point, via one filtered
    * max_by aggregate (no window sort).
    */
  def cdcAsofSnapshot(s: SparkSession, dir: String): DataFrame =
    graft.cdc.Cdc.asOfSnapshot(cdcEvents(s, dir), Seq("user_id"),
        Seq("ts_sec", "event_id"), col("ts_sec") <= AsOfT1)
      .orderBy(col("user_id"))

  /** C27: snapshot diff — keys classified added/changed/unchanged between
    * the 01-11 and 01-21 as-of states (see [[graft.cdc.Cdc.snapshotDiff]]);
    * one full-outer PK join of the two snapshots, no history re-read.
    */
  def cdcSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val e = cdcEvents(s, dir)
    val snap = (p: Long) => graft.cdc.Cdc.asOfSnapshot(e, Seq("user_id"),
      Seq("ts_sec", "event_id"), col("ts_sec") <= p)
    graft.cdc.Cdc.snapshotDiff(snap(AsOfT1), snap(AsOfT2), Seq("user_id"),
        Seq("event_id"))
      .orderBy(col("status"))
  }

  /** S12: KMV sketch rollup across grouping sets — per-(type, week) cell
    * sketches of distinct users computed ONCE, then every rollup level
    * ((type), (week), ()) estimated by merging CELL SKETCHES only (the
    * merge law makes cell-truncate→merge-truncate ≡ direct sketch). The
    * aggregate-once-roll-up-everywhere pattern that replaces four
    * COUNT(DISTINCT) scans of a 100 TB fact table with sketch algebra
    * over a few thousand cells. Exact distincts ride along per level for
    * calibration; '*' / −1 are the ALL sentinels.
    */
  def sketchKmvCube(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val e = t(s, dir, "events").select(col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 604800000000").as("week"),
      col("user_id"), Kmv.hash48(col("user_id")).as("h"))
    val cells = e.groupBy(col("event_type"), col("week"))
      .agg(Kmv.kmvSketch(col("h"), k).as("sk"))
      .ckpt // four rollup scans of a tiny cell table
    def roll(tc: org.apache.spark.sql.Column, wc: org.apache.spark.sql.Column) =
      cells.select(tc.as("event_type"), wc.as("week"),
          explode(col("sk")).as("h"))
        .groupBy(col("event_type"), col("week"))
        .agg(Kmv.kmvDistinct(col("h"), k).as("kmv_est"))
    val est = roll(col("event_type"), col("week"))
      .unionByName(roll(col("event_type"), lit(-1L)))
      .unionByName(roll(lit("*"), col("week")))
      .unionByName(roll(lit("*"), lit(-1L)))
    def exact(tc: org.apache.spark.sql.Column, wc: org.apache.spark.sql.Column) =
      e.select(tc.as("event_type"), wc.as("week"), col("user_id"))
        .groupBy(col("event_type"), col("week"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
    val ex = exact(col("event_type"), col("week"))
      .unionByName(exact(col("event_type"), lit(-1L)))
      .unionByName(exact(lit("*"), col("week")))
      .unionByName(exact(lit("*"), lit(-1L)))
    est.join(ex, Seq("event_type", "week"))
      .select(col("event_type"), col("week"), col("n_exact"), col("kmv_est"))
      .orderBy(col("event_type"), col("week"))
  }

  /** R82: share-of-total (ratio-to-report) — each nation's revenue share
    * of its region in exact ppm, with the within-region revenue rank.
    * Revenue kept in integer cent·pct units end-to-end; the share
    * product widens through DECIMAL(38,0). One aggregate + one window
    * over the 25-row nation table.
    */
  def qShareOfTotal(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, dir, "lineitem")
    val rev = li
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"),
        (expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)") *
          (lit(100) - expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)")))
          .as("rev_u"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("rev_u")).cast("long").as("rev_u"))
    val w = Window.partitionBy(col("r_name"))
    rev
      .withColumn("region_u", sum(col("rev_u")).over(w))
      .withColumn("share_ppm",
        expr("CAST(CAST(rev_u AS DECIMAL(38,0)) * 1000000 div region_u AS BIGINT)"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("r_name"))
          .orderBy(col("rev_u").desc, col("n_name"))).cast("long"))
      .select(col("r_name"), col("n_name"), col("rev_u"), col("share_ppm"),
        col("rnk"))
      .orderBy(col("r_name"), col("rnk"))
  }

  /** T20: vocabulary build + token-id encoding — the tokenizer-adjacent
    * preprocessing step of an LLM data pipeline: rank the corpus
    * vocabulary by frequency (count desc, term — a total order), assign
    * ids by rank, and re-encode every document as its id sequence (OOV →
    * 0). The vocab here is the top 30 terms so the OOV path is real.
    * Scale shape: one token explode + one vocab aggregate; the ranked
    * vocab (vocab-sized, tiny) broadcasts back into the encode join; the
    * id sequence reassembles ORDER-SAFELY via array_sort on (pos, id)
    * structs, never relying on collect order.
    */
  def textVocabEncode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents")
    val tok = d.select(col("doc_id"),
        posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("term"))
    // distributed top-k FIRST (TakeOrderedAndProject), so the rank window
    // runs on a provably-30-row table — never a global sort of the full
    // vocabulary (the trainCentroids-seeding anti-pattern)
    val top = tok.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(30)
    val vocab = top.withColumn("id", row_number().over(
        Window.orderBy(col("n").desc, col("term"))).cast("long"))
      .select(col("term"), col("id"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("id"), lit(0L)).as("id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("id") === 0L, 1L).otherwise(0L)).as("n_oov"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("id")))),
          x => x.getField("id")), ",").as("ids"))
      .orderBy(col("doc_id"))
  }

  /** R83: class-balance report over the embedding corpus labels — per
    * label population and share in exact ppm, plus the Gini impurity
    * (10⁶ − Σ nᵢ²·10⁶ div N², the split-quality metric with an exact
    * rational form where entropy's log has none) carried as a constant
    * column. The pre-training "is the label mix degenerate" check.
    */
  def qClassBalance(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = t(s, dir, "embeddings")
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy()
    counts
      .withColumn("n_total", sum(col("n")).over(w))
      .withColumn("share_ppm", expr("n * 1000000 div n_total"))
      .withColumn("gini_ppm",
        expr("1000000 - sum(n * n) OVER () * 1000000 div (n_total * n_total)"))
      .select(col("label"), col("n"), col("share_ppm"), col("gini_ppm"))
      .orderBy(col("label"))
  }

  /** R67d: frequent triples — market-basket mining one level up from the
    * R67 pairs: ordered 3-itemsets with support ≥ 2, enumerated directly
    * per basket (orders hold ≤ 7 distinct parts, so C(n,3) ≤ 35 rows per
    * basket — bounded by the basket contract, never corpus-quadratic).
    * At scale, skew-hostile mega-baskets would be capped upstream by the
    * same per-source limiter as T10.
    */
  def qBasketTriples(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .distinct()
    val a = li.select(col("basket"), col("item").as("i1"))
    val b = li.select(col("basket"), col("item").as("i2"))
    val c = li.select(col("basket"), col("item").as("i3"))
    a.join(b, Seq("basket")).filter(col("i1") < col("i2"))
      .join(c, Seq("basket")).filter(col("i2") < col("i3"))
      .groupBy(col("i1"), col("i2"), col("i3"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .orderBy(col("i1"), col("i2"), col("i3"))
  }

  /** R84: latency percentile report — p50/p95/p99 of per-user
    * inter-event gaps by event type, under the NEAREST-RANK definition
    * (value at rank ⌈q·n⌉ in (gap, user, event) total order): pure
    * integer selection, where interpolated p95/p99 would put a
    * non-dyadic float on the engine boundary. One window pass for gaps,
    * one for ranks, one conditional aggregate.
    */
  def qLatencyPercentiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"))
    val wUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val gaps = e
      .withColumn("gap", col("ts_sec") - lag(col("ts_sec"), 1).over(wUser))
      .filter(col("gap").isNotNull)
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("gap"), col("user_id"), col("event_id"))
    gaps
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("gap"))).as("p50_sec"),
        max(when(col("rn") === expr("(95 * n + 99) div 100"), col("gap"))).as("p95_sec"),
        max(when(col("rn") === expr("(99 * n + 99) div 100"), col("gap"))).as("p99_sec"))
      .orderBy(col("event_type"))
  }

  /** C28: backfill gap planner — per event type, the hour slots inside
    * the type's own [first, last] activity range with NO rows: what a
    * replication backfill job must re-pull after an outage. Calendar
    * densify via the bounded sequence explode (the R60 shape, ≤ span
    * hours per type — never a range self-join), anti-join the observed
    * slots, then a compact per-type summary.
    */
  def cdcBackfillPlan(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("hr"))
    val observed = e.distinct()
    val spans = observed.groupBy(col("event_type"))
      .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
    val slots = spans.select(col("event_type"),
      explode(sequence(col("lo"), col("hi"))).as("hr"))
    val missing = slots.join(observed, Seq("event_type", "hr"), "left_anti")
    missing.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_missing_hours"),
        min(col("hr")).as("first_missing_hr"),
        max(col("hr")).as("last_missing_hr"))
      .join(spans.select(col("event_type"),
        (col("hi") - col("lo") + 1).as("n_slot_hours")), Seq("event_type"))
      .select(col("event_type"), col("n_slot_hours"), col("n_missing_hours"),
        col("first_missing_hr"), col("last_missing_hr"))
      .orderBy(col("event_type"))
  }

  /** R85: cumulative distinct count — per user, the running number of
    * DISTINCT event types ever used, at every event. The naive running
    * COUNT(DISTINCT) over a growing frame is O(n²); the linear form
    * flags each (user, type)'s FIRST occurrence with one window pass and
    * prefix-sums the flags with a second — both on the same user
    * partitioning, one shuffle total.
    */
  def qCumulativeDistinct(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"))
    val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_sec"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("is_first",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .withColumn("n_types_seen", sum(col("is_first")).over(wRun))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("n_types_seen"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** T21: top-p (nucleus) corpus selection — per source, keep the
    * highest-quality documents until their cumulative score mass reaches
    * 80% of the source total (the first document crossing the line is
    * kept, matching nucleus sampling's inclusive cut). The
    * quality-concentration counterpart of T19's bottom-decile drop: how
    * few documents carry most of the quality mass. All-integer: scores
    * in ppm, the cut test is cum·100 ≤ total·80 OR (cum−score)·100 <
    * total·80. One aggregate + two windows on the source partitioning.
    */
  def corpusTopP(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents")
    val scored = d.select(col("source"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
        TextFunctions.stopwordHits(col("text"), QueriesData.stopwords)
          .cast("long").as("stop_hits"))
      .withColumn("score_ppm",
        expr("(least(n_tok * 1000000 div 64, 1000000) + " +
          "least(stop_hits * 4000000 div n_tok, 1000000)) div 2"))
    val wCum = Window.partitionBy(col("source"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("source"))
    scored
      .withColumn("cum", sum(col("score_ppm")).over(wCum))
      .withColumn("total", sum(col("score_ppm")).over(wTot))
      .withColumn("kept",
        (col("cum") - col("score_ppm")) * 100 < col("total") * 80)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        max(col("total")).as("total_score"),
        max(when(col("kept"), col("cum"))).as("kept_score"))
      .orderBy(col("source"))
  }

  /** R86: 2-D histogram — purchase-value decimal-digit bucket × ISO
    * weekday density over the event stream: the heatmap a monitoring
    * dashboard draws, with both axes under exact integer contracts
    * (digit count, epoch-day mod 7).
    */
  def qHistogram2d(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(
      round(col("value") * 100).cast("long").as("cents"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"))
    e.select(length(col("cents").cast("string")).cast("long").as("cents_digits"),
        // 1970-01-01 was a Thursday: (day + 3) % 7 gives Monday = 0
        ((col("day") + 3) % 7).as("weekday"))
      .groupBy(col("cents_digits"), col("weekday"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("cents_digits"), col("weekday"))
  }

  /** R87: "customers also bought" — per item, the top-3 co-purchased
    * items by directed co-occurrence count, served by the NATIVE grouped
    * top-k operator (map-side bounded buffers: the shuffle carries
    * O(partitions·items·k) rows, where the window form sorts every
    * (item, co_item) pair). The recommendation table every commerce
    * replica materializes.
    */
  def qAlsoBought(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .distinct()
    val co = li.join(li.withColumnRenamed("item", "co_item"), Seq("basket"))
      .filter(col("item") =!= col("co_item"))
      .groupBy(col("item"), col("co_item"))
      .agg(count(lit(1)).as("n"))
    graft.plans.GroupedTopK.topK(co, Seq("item"), col("n"), col("co_item"),
        k = 3, rankName = "rnk")
      .select(col("item"), col("co_item"), col("n"), col("rnk"))
      .orderBy(col("item"), col("rnk"))
  }

  /** Q3: k-anonymity screen — per event type, how many (type, day)
    * activity groups expose fewer than 5 distinct users (the
    * re-identification risk unit of a quasi-identifier release). One
    * distinct + two aggregates; the governance gate a dataset passes
    * before an external share.
    */
  def dqKAnonymity(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"),
      col("user_id"))
    e.groupBy(col("event_type"), col("day"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_users") < 5, 1L).otherwise(0L)).as("n_risky_groups"),
        min(col("n_users")).as("min_group_users"))
      .orderBy(col("event_type"))
  }

  /** C29: one-pass column profile (ANALYZE) — per profiled column: row
    * count, null count, KMV distinct estimate, lexicographic min/max of
    * the canonical string form. ONE scan builds every profile (a wide
    * aggregate row unpivoted to column rows) — the per-column-scan
    * ANALYZE loop is exactly what a 100 TB table can't afford. NULLs
    * fold to the ␀ sentinel inside the NDV hash (reported separately as
    * n_null).
    */
  def statsColumnProfile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")
    val strCols = Set("l_returnflag", "l_linestatus")
    val li = t(s, dir, "lineitem")
      .select(cols.map(c =>
        col(c).cast(if (strCols(c)) "string" else "long")
          .cast("string").as(c)): _*)
    val aggs = cols.flatMap { c =>
      val canon = coalesce(col(c), lit("␀"))
      Seq(count(col(c)).as(s"nn_$c"),
        Kmv.kmvDistinct(Kmv.hash48(canon), 64).as(s"ndv_$c"),
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        count(lit(1)).as(s"n_$c"))
    }
    // the whole profile is ONE wide aggregate row; checkpoint it so the
    // per-column unpivot projections don't re-run the scan
    val wide = li.agg(aggs.head, aggs.tail: _*).ckpt
    cols.map(c => wide.select(lit(c).as("column_name"),
        col(s"n_$c").as("n_rows"),
        (col(s"n_$c") - col(s"nn_$c")).as("n_null"),
        col(s"ndv_$c").as("ndv_est"),
        col(s"min_$c").as("min_s"), col(s"max_$c").as("max_s")))
      .reduce(_ unionByName _)
      .orderBy(col("column_name"))
  }

  /** R88: time-to-convert — for every touch (click/view), the seconds
    * until the user's NEXT purchase via one forward-frame window min
    * (rows (1, ∞)) — no event-stream self-join; converted = within 7
    * days. Per touch type: touch counts, conversion rate in exact ppm,
    * and the nearest-rank median conversion lag (the R84 integer
    * percentile contract).
    */
  def qTimeToConvert(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"))
    val wFollow = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val touches = e
      .withColumn("np",
        min(when(col("event_type") === "purchase", col("ts_sec"))).over(wFollow))
      .filter(col("event_type").isin("click", "view"))
      .withColumn("tt", col("np") - col("ts_sec"))
      .withColumn("converted", col("tt").isNotNull && col("tt") <= 604800L)
    val conv = touches.filter(col("converted"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("tt"), col("user_id"), col("event_id"))))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val med = conv.groupBy(col("event_type"))
      .agg(max(when(col("rn") === expr("(m + 1) div 2"), col("tt")))
        .as("p50_convert_sec"))
    touches.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
      .withColumn("conv_ppm", expr("n_converted * 1000000 div n_touches"))
      .join(med, Seq("event_type"), "left")
      .select(col("event_type"), col("n_touches"), col("n_converted"),
        col("conv_ppm"), col("p50_convert_sec"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- oracle

  /** R79's report SQL — shared verbatim by X19 (`stream_attribution`). */
  private val attributionSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      |    CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), a AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type IN ('click', 'view')
      |      THEN event_type END IGNORE NULLS) OVER w AS last_type,
      |    last_value(CASE WHEN event_type IN ('click', 'view')
      |      THEN ts_sec END IGNORE NULLS) OVER w AS last_ts,
      |    first_value(CASE WHEN event_type IN ('click', 'view')
      |      THEN event_type END IGNORE NULLS) OVER w AS first_type
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |), p AS (
      |  SELECT
      |    CASE WHEN last_ts IS NOT NULL AND ts_sec - last_ts <= 604800
      |      THEN last_type ELSE 'direct' END AS last_touch,
      |    COALESCE(first_type, 'direct') AS first_touch, cents
      |  FROM a WHERE event_type = 'purchase'
      |)
      |SELECT model, touch, n_purchases, revenue_cents FROM (
      |  SELECT 'first_touch' AS model, first_touch AS touch,
      |    CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |    CAST(SUM(cents) AS BIGINT) AS revenue_cents
      |  FROM p GROUP BY first_touch
      |  UNION ALL
      |  SELECT 'last_touch', last_touch,
      |    CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
      |  FROM p GROUP BY last_touch
      |) u ORDER BY model, touch""".stripMargin

  /** Shared straight-line peel prefix: the co-purchase edge set then 4
    * rounds of (degree ≥ 3 survivor set, both-endpoint restriction).
    */
  private val kcorePeelSql = {
    val rounds = (1 to 4).map { r =>
      s"""k$r AS (SELECT src FROM e${r - 1} GROUP BY src HAVING COUNT(*) >= 3),
         |e$r AS (
         |  SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN k$r x ON e.src = x.src JOIN k$r y ON e.dst = y.src
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |und AS (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |), e0 AS (
       |  SELECT a AS src, b AS dst FROM und
       |  UNION ALL SELECT b, a FROM und
       |),
       |$rounds""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "graph_kcore" ->
      s"""$kcorePeelSql
         |SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg_core
         |FROM e4 GROUP BY src ORDER BY node""".stripMargin,
    "q_kmv_retention" ->
      s"""WITH act AS (
         |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
         |    ${QueriesR3.hex12ToInt("md5(CAST(user_id AS VARCHAR))")} AS h
         |  FROM events
         |), sk AS (
         |  SELECT day, h FROM (
         |    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
         |    FROM act) r
         |  WHERE rn <= 64
         |), days AS (SELECT DISTINCT day FROM sk),
         |pairs AS (
         |  SELECT d.day, o.offset_d, d.day + o.offset_d AS target_day
         |  FROM days d
         |  CROSS JOIN (SELECT unnest(range(0, 7)) AS offset_d) o
         |  JOIN days t ON t.day = d.day + o.offset_d
         |), u AS (
         |  SELECT p.day, p.offset_d, s.h,
         |    MAX(CASE WHEN s.day = p.day THEN 1 ELSE 0 END) AS in_a,
         |    MAX(CASE WHEN s.day = p.target_day THEN 1 ELSE 0 END) AS in_b
         |  FROM pairs p JOIN sk s ON s.day IN (p.day, p.target_day)
         |  GROUP BY p.day, p.offset_d, s.h
         |), mm AS (
         |  SELECT day, offset_d,
         |    CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(MAX(h) AS BIGINT) AS theta,
         |    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x_common
         |  FROM (SELECT day, offset_d, h, in_a, in_b,
         |          row_number() OVER (PARTITION BY day, offset_d ORDER BY h) AS rn
         |        FROM u) q
         |  WHERE rn <= 64
         |  GROUP BY day, offset_d
         |), aa AS (
         |  SELECT day, CAST(COUNT(*) AS BIGINT) AS m_a,
         |    CAST(MAX(h) AS BIGINT) AS theta_a
         |  FROM sk GROUP BY day
         |), est AS (
         |  SELECT mm.day, mm.offset_d, mm.m, mm.x_common,
         |    CASE WHEN aa.m_a < 64 THEN aa.m_a
         |      ELSE ${63L * Kmv.HashRange} // aa.theta_a END AS cohort_est,
         |    CASE WHEN mm.m < 64 THEN mm.m
         |      ELSE ${63L * Kmv.HashRange} // mm.theta END AS union_est
         |  FROM mm JOIN aa ON aa.day = mm.day
         |), f AS (
         |  SELECT day, offset_d, cohort_est,
         |    CASE WHEN m < 64 THEN x_common
         |      ELSE (x_common * union_est) // 64 END AS inter_est
         |  FROM est
         |)
         |SELECT day, CAST(offset_d AS BIGINT) AS offset_d, cohort_est,
         |  inter_est,
         |  CAST(CAST(inter_est AS HUGEINT) * 1000000 // cohort_est
         |    AS BIGINT) AS ret_ppm
         |FROM f ORDER BY day, offset_d""".stripMargin,
    "text_phrase_prox" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(toks) AS term,
        |    unnest(range(1, len(toks) + 1)) AS pos
        |  FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents) d
        |), pa AS (SELECT doc_id, pos AS pa FROM tok WHERE term = 'window'),
        |pb AS (SELECT doc_id, pos AS pb FROM tok WHERE term = 'scan')
        |SELECT p.doc_id,
        |  CAST(SUM(CASE WHEN pb = pa + 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_phrase,
        |  CAST(MIN(ABS(pb - pa)) AS BIGINT) AS min_dist
        |FROM pa p JOIN pb q ON p.doc_id = q.doc_id
        |GROUP BY p.doc_id
        |ORDER BY n_phrase DESC, min_dist, p.doc_id LIMIT 200""".stripMargin,
    // the incremental split + delta merge reproduces the full-batch
    // owns-all-bands rule EXACTLY, so the oracle IS stream_near_dup's
    "dedup_incremental" -> QueriesData.sql("stream_near_dup"),
    "q_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), g AS (
        |  SELECT user_id, cents,
        |    lead(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
        |      - ts_sec AS dt
        |  FROM e
        |)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |  CAST(SUM(dt) AS BIGINT) AS span_sec,
        |  CAST(SUM(cents * dt) // NULLIF(SUM(dt), 0) AS BIGINT) AS twap_cents
        |FROM g WHERE dt IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_robust_anomaly" ->
      """WITH c AS (
        |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), m AS (
        |  SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
        |  FROM c GROUP BY 1
        |), d AS (
        |  SELECT c.event_type, ABS(c.cents - m.med_cents) AS dev, m.med_cents
        |  FROM c JOIN m USING (event_type)
        |), md AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad_cents
        |  FROM d GROUP BY 1
        |)
        |SELECT d.event_type, MAX(d.med_cents) AS med_cents,
        |  MAX(md.mad_cents) AS mad_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN d.dev > 5 * md.mad_cents THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "q_attribution" -> attributionSql,
    // X19 shares R79's report and oracle: the streaming rows ARE the
    // batch window carries under ordered delivery
    "stream_attribution" -> attributionSql,
    "graph_bfs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |und AS (
        |  SELECT a.l_partkey AS a, b.l_partkey AS b
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2
        |), e AS (
        |  SELECT a AS src, b AS dst FROM und
        |  UNION ALL SELECT b, a FROM und
        |), nodes AS (SELECT DISTINCT src AS node FROM e),
        |d0 AS (SELECT node, CAST(0 AS BIGINT) AS hops FROM nodes WHERE node % 97 = 0),
        |d1 AS (
        |  SELECT node, MIN(hops) AS hops FROM (
        |    SELECT node, hops FROM d0
        |    UNION ALL SELECT e.dst, d.hops + 1 FROM e JOIN d0 d ON d.node = e.src) u
        |  GROUP BY node
        |), d2 AS (
        |  SELECT node, MIN(hops) AS hops FROM (
        |    SELECT node, hops FROM d1
        |    UNION ALL SELECT e.dst, d.hops + 1 FROM e JOIN d1 d ON d.node = e.src) u
        |  GROUP BY node
        |), d3 AS (
        |  SELECT node, MIN(hops) AS hops FROM (
        |    SELECT node, hops FROM d2
        |    UNION ALL SELECT e.dst, d.hops + 1 FROM e JOIN d2 d ON d.node = e.src) u
        |  GROUP BY node
        |)
        |SELECT node, CAST(hops AS BIGINT) AS hops FROM d3 ORDER BY node""".stripMargin,
    "corpus_quality_filter" ->
      s"""WITH sc AS (
         |  SELECT source, doc_id,
         |    (LEAST(len(${QueriesData.toks}) * 1000000 // 64, 1000000) +
         |     LEAST(${QueriesData.stopHits} * 4000000 // len(${QueriesData.toks}),
         |       1000000)) // 2 AS score_ppm
         |  FROM documents
         |), r AS (
         |  SELECT source, score_ppm,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY score_ppm, doc_id) AS rnk,
         |    COUNT(*) OVER (PARTITION BY source) AS n_src
         |  FROM sc
         |)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN (rnk - 1) * 10 >= n_src THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  CAST(MAX(CASE WHEN (rnk - 1) * 10 < n_src THEN score_ppm END)
         |    AS BIGINT) AS max_dropped_ppm,
         |  CAST(MIN(CASE WHEN (rnk - 1) * 10 >= n_src THEN score_ppm END)
         |    AS BIGINT) AS min_kept_ppm
         |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "cdc_asof_snapshot" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
         |    event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE CAST(floor(epoch(ts)) AS BIGINT) <= $AsOfT1
         |)
         |SELECT user_id, event_id, ts_sec, event_type, cents FROM (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts_sec DESC, event_id DESC) AS rn
         |  FROM e) q
         |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "cdc_snapshot_diff" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
         |  FROM events
         |), s1 AS (
         |  SELECT user_id, event_id FROM (
         |    SELECT user_id, event_id, row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts_sec DESC, event_id DESC) AS rn
         |    FROM e WHERE ts_sec <= $AsOfT1) q WHERE rn = 1
         |), s2 AS (
         |  SELECT user_id, event_id FROM (
         |    SELECT user_id, event_id, row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts_sec DESC, event_id DESC) AS rn
         |    FROM e WHERE ts_sec <= $AsOfT2) q WHERE rn = 1
         |)
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_keys FROM (
         |  SELECT CASE WHEN s1.user_id IS NULL THEN 'added'
         |    WHEN s2.user_id IS NULL THEN 'removed'
         |    WHEN s1.event_id <> s2.event_id THEN 'changed'
         |    ELSE 'unchanged' END AS status
         |  FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id) q
         |GROUP BY status ORDER BY status""".stripMargin,
    "sketch_kmv_cube" ->
      s"""WITH a AS (
         |  SELECT DISTINCT event_type,
         |    epoch_us(ts) // 604800000000 AS week,
         |    ${QueriesR3.hex12ToInt("md5(CAST(user_id AS VARCHAR))")} AS h,
         |    user_id
         |  FROM events
         |), cell AS (
         |  SELECT event_type, week, h FROM (
         |    SELECT event_type, week, h, row_number() OVER (
         |      PARTITION BY event_type, week ORDER BY h) AS rn
         |    FROM (SELECT DISTINCT event_type, week, h FROM a) q) r
         |  WHERE rn <= 64
         |), g AS (
         |  SELECT event_type, week, h FROM cell
         |  UNION ALL SELECT event_type, CAST(-1 AS BIGINT), h FROM cell
         |  UNION ALL SELECT '*', week, h FROM cell
         |  UNION ALL SELECT '*', CAST(-1 AS BIGINT), h FROM cell
         |), r AS (
         |  SELECT event_type, week, h,
         |    row_number() OVER (PARTITION BY event_type, week ORDER BY h) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type, week) AS nd
         |  FROM (SELECT DISTINCT event_type, week, h FROM g) q
         |), est AS (
         |  SELECT event_type, week,
         |    CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
         |      ELSE ${63L * Kmv.HashRange} // MAX(CASE WHEN rn = 64 THEN h END)
         |      END AS BIGINT) AS kmv_est
         |  FROM r WHERE rn <= 64 GROUP BY event_type, week
         |), base AS (
         |  SELECT event_type, week, user_id FROM a
         |  UNION ALL SELECT event_type, CAST(-1 AS BIGINT), user_id FROM a
         |  UNION ALL SELECT '*', week, user_id FROM a
         |  UNION ALL SELECT '*', CAST(-1 AS BIGINT), user_id FROM a
         |), ex AS (
         |  SELECT event_type, week,
         |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
         |  FROM base GROUP BY event_type, week
         |)
         |SELECT est.event_type, est.week, ex.n_exact, est.kmv_est
         |FROM est JOIN ex ON est.event_type = ex.event_type
         |  AND est.week = ex.week
         |ORDER BY est.event_type, est.week""".stripMargin,
    "q_share_of_total" ->
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
        |      (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)))
        |      AS BIGINT) AS rev_u
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name
        |)
        |SELECT r_name, n_name, rev_u,
        |  CAST(CAST(rev_u AS HUGEINT) * 1000000 //
        |    SUM(rev_u) OVER (PARTITION BY r_name) AS BIGINT) AS share_ppm,
        |  CAST(row_number() OVER (PARTITION BY r_name
        |    ORDER BY rev_u DESC, n_name) AS BIGINT) AS rnk
        |FROM rev ORDER BY r_name, rnk""".stripMargin,
    "text_vocab_encode" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(toks) AS term,
        |    unnest(range(1, len(toks) + 1)) AS pos
        |  FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents) d
        |), vocab AS (
        |  SELECT term, CAST(row_number() OVER (ORDER BY n DESC, term)
        |    AS BIGINT) AS id
        |  FROM (SELECT term, COUNT(*) AS n FROM tok GROUP BY term
        |        ORDER BY n DESC, term LIMIT 30) v
        |)
        |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  string_agg(CAST(COALESCE(v.id, 0) AS VARCHAR), ',' ORDER BY t.pos)
        |    AS ids
        |FROM tok t LEFT JOIN vocab v USING (term)
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "q_class_balance" ->
      """WITH c AS (
        |  SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM embeddings GROUP BY 1
        |), s AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
        |    CAST(SUM(n * n) AS BIGINT) AS ss
        |  FROM c
        |)
        |SELECT label, n, CAST(n * 1000000 // n_total AS BIGINT) AS share_ppm,
        |  CAST(1000000 - ss * 1000000 // (n_total * n_total) AS BIGINT)
        |    AS gini_ppm
        |FROM c, s ORDER BY label""".stripMargin,
    "q_basket_triples" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
        |)
        |SELECT a.item AS i1, b.item AS i2, c.item AS i3,
        |  CAST(COUNT(*) AS BIGINT) AS support
        |FROM li a
        |JOIN li b ON a.basket = b.basket AND a.item < b.item
        |JOIN li c ON b.basket = c.basket AND b.item < c.item
        |GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
        |ORDER BY i1, i2, i3""".stripMargin,
    "q_latency_percentiles" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |  FROM events
        |), g AS (
        |  SELECT event_type, user_id, event_id,
        |    ts_sec - lag(ts_sec) OVER (PARTITION BY user_id
        |      ORDER BY ts_sec, event_id) AS gap
        |  FROM e
        |), r AS (
        |  SELECT event_type, gap,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY gap, user_id, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM g WHERE gap IS NOT NULL
        |)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS BIGINT)
        |    AS p50_sec,
        |  CAST(MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN gap END)
        |    AS BIGINT) AS p95_sec,
        |  CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN gap END)
        |    AS BIGINT) AS p99_sec
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "cdc_backfill_plan" ->
      """WITH e AS (
        |  SELECT DISTINCT event_type, epoch_us(ts) // 3600000000 AS hr
        |  FROM events
        |), spans AS (
        |  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM e GROUP BY 1
        |), slots AS (
        |  SELECT event_type, unnest(range(lo, hi + 1)) AS hr FROM spans
        |), miss AS (
        |  SELECT s.event_type, s.hr FROM slots s
        |  LEFT JOIN e ON e.event_type = s.event_type AND e.hr = s.hr
        |  WHERE e.hr IS NULL
        |)
        |SELECT m.event_type, CAST(sp.hi - sp.lo + 1 AS BIGINT) AS n_slot_hours,
        |  CAST(COUNT(*) AS BIGINT) AS n_missing_hours,
        |  MIN(m.hr) AS first_missing_hr, MAX(m.hr) AS last_missing_hr
        |FROM miss m JOIN spans sp ON sp.event_type = m.event_type
        |GROUP BY m.event_type, sp.hi, sp.lo
        |ORDER BY m.event_type""".stripMargin,
    "q_cumulative_distinct" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |  FROM events
        |), f AS (
        |  SELECT user_id, event_id, event_type, ts_sec,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts_sec, event_id) = 1 THEN 1 ELSE 0 END AS is_first
        |  FROM e
        |)
        |SELECT user_id, event_id, event_type,
        |  CAST(SUM(is_first) OVER (PARTITION BY user_id
        |    ORDER BY ts_sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_types_seen
        |FROM f ORDER BY user_id, event_id""".stripMargin,
    "corpus_top_p" ->
      s"""WITH sc AS (
         |  SELECT source, doc_id,
         |    (LEAST(len(${QueriesData.toks}) * 1000000 // 64, 1000000) +
         |     LEAST(${QueriesData.stopHits} * 4000000 // len(${QueriesData.toks}),
         |       1000000)) // 2 AS score_ppm
         |  FROM documents
         |), r AS (
         |  SELECT source, score_ppm,
         |    SUM(score_ppm) OVER (PARTITION BY source
         |      ORDER BY score_ppm DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(score_ppm) OVER (PARTITION BY source) AS total
         |  FROM sc
         |)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN (cum - score_ppm) * 100 < total * 80
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(MAX(total) AS BIGINT) AS total_score,
         |  CAST(MAX(CASE WHEN (cum - score_ppm) * 100 < total * 80
         |    THEN cum END) AS BIGINT) AS kept_score
         |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q_histogram_2d" ->
      """SELECT CAST(len(CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR))
        |    AS BIGINT) AS cents_digits,
        |  (epoch_us(ts) // 86400000000 + 3) % 7 AS weekday,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events
        |GROUP BY 1, 2 ORDER BY cents_digits, weekday""".stripMargin,
    "q_also_bought" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
        |), co AS (
        |  SELECT a.item, b.item AS co_item, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM li a JOIN li b ON a.basket = b.basket AND a.item <> b.item
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT item, co_item, n,
        |    CAST(row_number() OVER (PARTITION BY item ORDER BY n DESC, co_item)
        |      AS BIGINT) AS rnk
        |  FROM co
        |)
        |SELECT item, co_item, n, rnk FROM r WHERE rnk <= 3
        |ORDER BY item, rnk""".stripMargin,
    "dq_k_anonymity" ->
      """WITH g AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN n_users < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_risky_groups,
        |  CAST(MIN(n_users) AS BIGINT) AS min_group_users
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stats_column_profile" -> {
      val cols = Seq(("l_orderkey", false), ("l_partkey", false),
        ("l_suppkey", false), ("l_linenumber", false),
        ("l_returnflag", true), ("l_linestatus", true))
      cols.map { case (c, isStr) =>
        val cs = if (isStr) s"CAST($c AS VARCHAR)"
          else s"CAST(CAST($c AS BIGINT) AS VARCHAR)"
        s"""SELECT '$c' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(COUNT(*) - COUNT($cs) AS BIGINT) AS n_null,
           |  (SELECT CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
           |     ELSE ${63L * Kmv.HashRange} // MAX(CASE WHEN rn = 64 THEN h END)
           |     END AS BIGINT)
           |   FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn,
           |           COUNT(*) OVER () AS nd
           |         FROM (SELECT DISTINCT
           |             ${QueriesR3.hex12ToInt(s"md5(COALESCE($cs, '␀'))")} AS h
           |           FROM lineitem) hh) rr
           |   WHERE rn <= 64) AS ndv_est,
           |  MIN($cs) AS min_s, MAX($cs) AS max_s
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    "q_time_to_convert" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |  FROM events
        |), tch AS (
        |  SELECT event_type, user_id, event_id, ts_sec,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts_sec END)
        |      OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
        |  FROM e
        |), t2 AS (
        |  SELECT event_type, user_id, event_id, np - ts_sec AS tt,
        |    (np IS NOT NULL AND np - ts_sec <= 604800) AS converted
        |  FROM tch WHERE event_type IN ('click', 'view')
        |), conv AS (
        |  SELECT event_type, tt,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY tt, user_id, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS m
        |  FROM t2 WHERE converted
        |), med AS (
        |  SELECT event_type,
        |    CAST(MAX(CASE WHEN rn = (m + 1) // 2 THEN tt END) AS BIGINT)
        |      AS p50_convert_sec
        |  FROM conv GROUP BY event_type
        |)
        |SELECT t2.event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_converted,
        |  CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS conv_ppm,
        |  MAX(med.p50_convert_sec) AS p50_convert_sec
        |FROM t2 LEFT JOIN med ON med.event_type = t2.event_type
        |GROUP BY t2.event_type ORDER BY t2.event_type""".stripMargin)
}
