package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-4 continuation gates (batch c): the r5+ queue items that are
  * SQL-expressible plus the mixture/monitoring operators a training-data
  * pipeline runs on top of the analytics core — transition-probability
  * normalization, proportional budget allocation, CUSUM changepoint
  * detection, quantile binning, trailing-window distinct. Oracle
  * discipline unchanged: integer/decimal algebra only (ppm fixed-point
  * for every ratio), full-tiebreak ORDER BY, md5-portable hashing.
  */
object QueriesR5 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Deterministic integer cents with injected 10× spikes — the shared
    * fixture construction of the anomaly/moments gates (QueriesR4), reused
    * so the changepoint series has real work at every SF.
    */
  private def centsCol =
    round(col("value") *
      when(col("event_id") % 97 === 0, lit(1000.0)).otherwise(lit(100.0)))
      .cast("long")

  /** R58b (queue): transition matrix normalized to per-row probabilities.
    * The count matrix (q_event_transitions) says WHAT happened; the row
    * distribution says what a user DOES NEXT from each state — the actual
    * Markov kernel. Probabilities are exact ppm fixed-point:
    * (n · 10⁶) div row_total — floor division on positive longs, so both
    * engines produce the identical integer and the gate stays
    * hash-exact (no float division anywhere).
    */
  def qTransitionProbs(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val counts = e.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap", col("ts_sec") - lag(col("ts_sec"), 1).over(w))
      .filter(col("prev_type").isNotNull && col("gap") <= 1800)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val rowTotal = Window.partitionBy(col("prev_type"))
    counts
      .withColumn("row_total", sum(col("n_transitions")).over(rowTotal))
      .select(col("prev_type"), col("event_type").as("next_type"),
        col("n_transitions"),
        expr("n_transitions * 1000000 div row_total").as("prob_ppm"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** R59: largest-remainder (Hamilton) apportionment of a global sampling
    * budget across sources, proportional to document count — the mixture
    * arithmetic behind "sample 1000 docs, weighted by corpus share",
    * guaranteed to hand out EXACTLY the budget (floor quotas + the
    * largest fractional remainders get the leftovers). Pure integer:
    * quota = (B·nᵢ) div T, remainder = (B·nᵢ) mod T, ranked with the
    * source name as tiebreak. One aggregate to per-source counts (the
    * only pass over data); the apportionment runs on the handful of
    * source rows.
    */
  def qAllocBudget(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    graft.operators.Allocation.hamilton(counts, "source", "n_docs", 1000L)
      .orderBy(col("source"))
  }

  /** R61: CUSUM changepoint detection on the daily value series per event
    * type. The textbook recursion Sₜ = max(0, Sₜ₋₁ + xₜ − k) is not a
    * window function, but it has a closed form over prefix sums:
    * with Pₜ = Σᵢ≤ₜ (xᵢ − k),   Sₜ = Pₜ − min(0, minᵢ≤ₜ Pᵢ)
    * — one running sum + one running min, both plain window aggregates
    * inside whole-stage codegen, per-key partitioned (no global sort).
    * Everything is integer cents; the reference level k is the per-type
    * floor-mean of the daily sums, so both engines compute the identical
    * drift and the flag column is exact. Flagged days are where the
    * spike injection (event_id % 97 → 10×) accumulates above 2k.
    */
  def qCusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"),
      centsCol.as("cents"))
    val daily = e.groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("x"))
    val byType = Window.partitionBy(col("event_type"))
    val series = daily
      .withColumn("__sx", sum(col("x")).over(byType))
      .withColumn("__nd", count(lit(1)).over(byType))
      .withColumn("k", expr("__sx div __nd"))
    graft.operators.Changepoint
      .cusum(series, Seq("event_type"), "day", col("x"), col("k"))
      .select(col("event_type"), col("day"), col("x"), col("k"), col("s"),
        (col("s") > col("k") * 2).as("flagged"))
      .orderBy(col("event_type"), col("day"))
  }

  /** R62: quantile binning (feature discretization) — each event lands in
    * one of 4 equal-frequency bins per event type, ordered by
    * (cents, event_id) so the assignment is total and engine-identical
    * (NTILE is deterministic once the ORDER BY is a total order).
    * Reported per bin with population and value bounds — the
    * discretization table a feature pipeline persists. Binning runs on
    * [[graft.operators.Ranking.ntileExact]]'s two-stage rank, so the
    * per-type sort is range-bucket partitioned (a handful of event types
    * would otherwise make each window partition near-global).
    */
  def qQuantileBins(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), centsCol.as("cents"))
    graft.operators.Ranking.ntileExact(e, Seq("event_type"), col("cents"),
        Seq(col("event_id")), 4, "bin")
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"), min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .orderBy(col("event_type"), col("bin"))
  }

  /** R60: trailing-7-day distinct users per day — the rolling-reach
    * metric. COUNT(DISTINCT) has no sliding-window form, so each
    * (user, day) activity row is fanned out to the ≤7 target days it
    * contributes to (a BOUNDED explode — expansion factor = window
    * length, not data size) and one hash aggregate counts distincts per
    * target day; reported only for days that actually occur. At 100 TB
    * this beats the self-join formulation: the fan-out is map-side and
    * shuffles (user, target_day) pairs once.
    */
  def qSlidingDistinct(s: SparkSession, dir: String): DataFrame =
    graft.operators.Cohorts.rollingDistinct(t(s, dir, "events"), "user_id",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"), 7)
      .select(col("period").as("day"), col("n_distinct").as("n_users_7d"))
      .orderBy(col("day"))

  /** R64: gaps-and-islands — each user's streaks of consecutive active
    * days (see [[graft.operators.Intervals.islands]]). Integer day
    * indices; the island identity is the period − row_number constant.
    */
  def qIslands(s: SparkSession, dir: String): DataFrame =
    graft.operators.Intervals.islands(t(s, dir, "events"), Seq("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"))
      .orderBy(col("user_id"), col("start_period"))

  /** R65: interval coalescing — each event projects a 10-minute presence
    * window [ts, ts+600); overlapping-or-touching windows per user merge
    * into spans (see [[graft.operators.Intervals.coalesce]]). The union
    * of validity windows, in exact epoch seconds.
    */
  def qIntervalMerge(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"))
    graft.operators.Intervals.coalesce(e, Seq("user_id"),
        col("ts_sec"), col("ts_sec") + 600L)
      .orderBy(col("user_id"), col("start"))
  }

  /** R63: distributed triangle count on the co-purchase graph (parts
    * sharing an order) — degree-ordered orientation bounds the wedge
    * join on any degree distribution (see
    * [[graft.operators.Graph.triangleCount]]). The edge build is a
    * per-order self-join: bounded by order size, never all-pairs.
    */
  def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val a = li.select(col("l_orderkey"), col("l_partkey").as("src"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("dst"))
    val edges = a.join(b, Seq("l_orderkey"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    graft.operators.Graph.triangleCount(edges)
  }

  /** T14: conjunctive keyword search — documents containing ALL probe
    * terms, scored by total occurrences. The inverted-index probe shape:
    * one explode filtered to the probe terms (at 100 TB this is the
    * posting-list read, not a corpus scan) + one aggregate with a
    * distinct-term completeness check.
    */
  def textSearchConjunctive(s: SparkSession, dir: String): DataFrame = {
    val probes = Seq("query", "window", "scan")
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(probes: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("__nt"), count(lit(1)).as("n_hits"))
      .filter(col("__nt") === probes.length)
      .select(col("doc_id"), col("n_hits"))
      .orderBy(col("doc_id"))
  }

  /** T16: HTML/boilerplate stripping — the first stage of every web-crawl
    * corpus clean. The fixture corpus is plain text, so markup is
    * INJECTED deterministically from each row's own columns (the
    * text_redact idiom), then stripped with the shared Java∩RE2 regex
    * subset; the tag census rides along.
    */
  def textStripHtml(s: SparkSession, dir: String): DataFrame = {
    val tagged = concat(lit("<p id=\""), col("doc_id").cast("string"), lit("\">"),
      expr("replace(text, ' fast ', ' <b>fast</b> ')"), lit("</p>"))
    t(s, dir, "documents")
      .select(col("doc_id"), tagged.as("s"))
      .select(col("doc_id"),
        regexp_replace(col("s"), "<[^>]+>", "").as("stripped"),
        regexp_count(col("s"), lit("<[^>]+>")).cast("long").as("n_tags"))
      .orderBy(col("doc_id"))
  }

  /** T17: term co-occurrence counts over a fixed probe vocabulary — the
    * exact numerator of PMI/association mining, bounded by construction:
    * each document contributes at most C(|vocab|, 2) pairs, built
    * NARROWLY from the per-document intersection array (no self-join of
    * the exploded term table); the only shuffle is the final pair
    * aggregate.
    */
  def textCooccur(s: SparkSession, dir: String): DataFrame = {
    val vocab = Seq("query", "window", "scan", "merge", "sort", "key")
    val vt = array_intersect(array_distinct(split(col("text"), " ")),
      array(vocab.map(lit): _*))
    val pairs = flatten(transform(vt, x =>
      transform(filter(vt, y => y > x), y =>
        struct(x.as("term_a"), y.as("term_b")))))
    t(s, dir, "documents")
      .select(explode(pairs).as("p"))
      .groupBy(col("p.term_a").as("term_a"), col("p.term_b").as("term_b"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("term_a"), col("term_b"))
  }

  /** X15: streaming transition counts — per-user O(|types|²) state under
    * the seq-ordered delivery contract (see
    * [[graft.streaming.Streams.streamingTransitions]]); the drained
    * matrix must equal the batch window formulation, so the oracle is
    * q_event_transitions'.
    */
  def streamTransitions(s: SparkSession, dir: String): DataFrame = {
    val rows = t(s, dir, "events").select(col("user_id").as("user"),
      col("event_id").as("seq"), col("event_type").as("typ"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"))
    graft.streaming.Streams.streamingTransitions(s, rows, gapSec = 1800,
        queryName = s"gate_stransit_${System.nanoTime()}")
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** R66: RFM segmentation — the classic customer scoring composite:
    * recency (last order day) / frequency (order count) / monetary
    * (lifetime cents), each discretized into quintiles with the customer
    * key as total-order tiebreak, combined into the 3-digit segment code.
    * One aggregate over orders + three quintile passes over the
    * per-customer frame — one row per customer, i.e. data-sized at scale,
    * so each pass is [[graft.operators.Ranking.ntileExact]]'s two-stage
    * rank (partitioned everywhere), not a global NTILE window sort.
    */
  def qRfmSegmentation(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long")
    val rfm = t(s, dir, "orders")
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        cents.as("cents"))
      .groupBy(col("o_custkey"))
      .agg(max(col("day")).as("r_day"), count(lit(1)).as("f"),
        sum(col("cents")).as("m_cents"))
    def quint(df: DataFrame, c: String, out: String) =
      graft.operators.Ranking.ntileExact(df, Seq.empty, col(c),
        Seq(col("o_custkey")), 5, out)
    val scored = quint(quint(quint(rfm, "r_day", "r_score"),
      "f", "f_score"), "m_cents", "m_score")
    scored
      .withColumn("segment",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .orderBy(col("o_custkey"))
  }

  /** R67: market-basket 2-itemset association rules — pair support from
    * the bounded per-order self-join (the graph_triangles edge build),
    * item support from one aggregate, confidence in exact ppm both
    * directions. The A-priori first rung, all integer.
    */
  def qMarketBasket(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairSupport = li.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support_pair"))
      .filter(col("support_pair") >= 3)
    val itemSupport = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("support"))
    pairSupport
      .join(itemSupport.select(col("l_partkey").as("part_a"),
        col("support").as("support_a")), Seq("part_a"))
      .join(itemSupport.select(col("l_partkey").as("part_b"),
        col("support").as("support_b")), Seq("part_b"))
      .select(col("part_a"), col("part_b"), col("support_pair"),
        col("support_a"), col("support_b"),
        expr("support_pair * 1000000 div support_a").as("conf_a_to_b_ppm"),
        expr("support_pair * 1000000 div support_b").as("conf_b_to_a_ppm"))
      .orderBy(col("part_a"), col("part_b"))
  }

  /** R68: period-over-period growth — daily value per event type with
    * the previous day's total and the growth rate in signed ppm (trunc
    * division, identical in both engines). The first day of each series
    * reports null prev/growth, as a reporting layer would.
    */
  def qGrowthRates(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"),
        centsCol.as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("total"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily.withColumn("prev_total", lag(col("total"), 1).over(w))
      .withColumn("delta", col("total") - col("prev_total"))
      .withColumn("growth_ppm", expr("delta * 1000000 div prev_total"))
      .orderBy(col("event_type"), col("day"))
  }

  /** R57b: cohort retention normalized to ppm of the cohort's size (the
    * offset-0 cell) — the percentage matrix analysts actually read,
    * derived without floats.
    */
  def qRetentionPct(s: SparkSession, dir: String): DataFrame = {
    val day = expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
    val r = graft.operators.Cohorts.cohortRetention(
      t(s, dir, "events"), "user_id", day)
    val sizes = r.filter(col("period_offset") === 0)
      .select(col("cohort_period"), col("n_users").as("cohort_size"))
    r.join(sizes, Seq("cohort_period"))
      .select(col("cohort_period"), col("period_offset"), col("n_users"),
        col("cohort_size"),
        expr("n_users * 1000000 div cohort_size").as("retained_ppm"))
      .orderBy(col("cohort_period"), col("period_offset"))
  }

  /** X16: streaming CUSUM — two-long per-key state (see
    * [[graft.streaming.Streams.streamingCusum]]); the emitted statistic
    * series must equal the batch closed form, so the oracle is the
    * (event_type, day, s) projection of the changepoint gate's SQL.
    */
  def streamCusum(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"),
      centsCol.as("cents"))
    val daily = e.groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("x"))
    val byType = Window.partitionBy(col("event_type"))
    val rows = daily
      .withColumn("__sx", sum(col("x")).over(byType))
      .withColumn("__nd", count(lit(1)).over(byType))
      .select(col("event_type").as("key"), col("day").as("order"), col("x"),
        expr("__sx div __nd").as("k"))
    graft.streaming.Streams.streamingCusum(s, rows,
        queryName = s"gate_scusum_${System.nanoTime()}")
      .select(col("key").as("event_type"), col("order").as("day"), col("s"))
      .orderBy(col("event_type"), col("day"))
  }

  /** S10: cosine range search — every corpus vector above the threshold
    * per query (see [[graft.similarity.Ann.rangeSearch]]): LSH band
    * collisions for candidates, exact verify, in the band regime the
    * embedding near-dup gate pins recall-complete at 0.4 on this
    * fixture. Oracle: asymmetric brute force.
    */
  def annRangeSearch(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // 2% hash-strided probe set — vec_id < 10 has zero above-threshold
    // neighbors at sf0.001, and a 0-row gate proves nothing
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = e.select(col("vec_id").as("cand_id"), col("embedding"))
    graft.similarity.Ann.rangeSearch(queries, corpus, dim = 64, threshold = 0.4)
      .orderBy(col("query_id"), col("cand_id"))
  }

  // ---------------------------------------------------------------- oracle

  private val centsSql =
    "CAST(ROUND(value * (CASE WHEN event_id % 97 = 0 THEN 1000.0 ELSE 100.0 END)) AS BIGINT)"

  val sql: Map[String, String] = Map(
    "q_transition_probs" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |  FROM events
        |), m AS (
        |  SELECT event_type, lag(event_type) OVER w AS prev_type,
        |    ts_sec - lag(ts_sec) OVER w AS gap
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |), c AS (
        |  SELECT prev_type, event_type AS next_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_transitions
        |  FROM m WHERE prev_type IS NOT NULL AND gap <= 1800
        |  GROUP BY prev_type, event_type
        |)
        |SELECT prev_type, next_type, n_transitions,
        |  CAST((n_transitions * 1000000) //
        |    SUM(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT)
        |    AS prob_ppm
        |FROM c ORDER BY prev_type, next_type""".stripMargin,
    "q_alloc_budget" ->
      """WITH c AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
        |  GROUP BY source
        |), q AS (
        |  SELECT source, n_docs,
        |    (n_docs * 1000) // SUM(n_docs) OVER () AS base,
        |    (n_docs * 1000) % SUM(n_docs) OVER () AS rem
        |  FROM c
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS extra_rank,
        |    1000 - SUM(base) OVER () AS n_extra
        |  FROM q
        |)
        |SELECT source, n_docs,
        |  CAST(base + CASE WHEN extra_rank <= n_extra THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_alloc
        |FROM r ORDER BY source""".stripMargin,
    "q_cusum_changepoint" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    $centsSql AS cents
         |  FROM events
         |), daily AS (
         |  SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS x
         |  FROM e GROUP BY event_type, day
         |), series AS (
         |  SELECT *, SUM(x) OVER (PARTITION BY event_type) //
         |    COUNT(*) OVER (PARTITION BY event_type) AS k
         |  FROM daily
         |), pfx AS (
         |  SELECT *, SUM(x - k) OVER (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
         |  FROM series
         |)
         |SELECT event_type, day, x, CAST(k AS BIGINT) AS k,
         |  CAST(p - LEAST(0, MIN(p) OVER (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS s,
         |  (p - LEAST(0, MIN(p) OVER (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) > k * 2 AS flagged
         |FROM pfx ORDER BY event_type, day""".stripMargin,
    "q_quantile_bins" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type, $centsSql AS cents FROM events
         |), b AS (
         |  SELECT event_type, cents,
         |    CAST(NTILE(4) OVER (PARTITION BY event_type
         |      ORDER BY cents, event_id) AS BIGINT) AS bin
         |  FROM e
         |)
         |SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n,
         |  MIN(cents) AS min_cents, MAX(cents) AS max_cents
         |FROM b GROUP BY event_type, bin
         |ORDER BY event_type, bin""".stripMargin,
    "q_sliding_distinct" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events
        |), days AS (SELECT DISTINCT day FROM act)
        |SELECT d.day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users_7d
        |FROM days d JOIN act a ON a.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day ORDER BY d.day""".stripMargin,
    "q_islands" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS period
        |  FROM events
        |), g AS (
        |  SELECT user_id, period,
        |    period - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY period) AS grp
        |  FROM act
        |)
        |SELECT user_id, MIN(period) AS start_period, MAX(period) AS end_period,
        |  CAST(COUNT(*) AS BIGINT) AS n_periods
        |FROM g GROUP BY user_id, grp
        |ORDER BY user_id, start_period""".stripMargin,
    "q_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |    CAST(floor(epoch(ts)) AS BIGINT) + 600 AS e
        |  FROM events
        |), m AS (
        |  SELECT user_id, s, e,
        |    CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -9223372036854775808)
        |      THEN 1 ELSE 0 END AS new_island
        |  FROM iv
        |), isl AS (
        |  SELECT user_id, s, e,
        |    SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m
        |)
        |SELECT user_id, MIN(s) AS start, MAX(e) AS "end",
        |  CAST(COUNT(*) AS BIGINT) AS n_merged
        |FROM isl GROUP BY user_id, island
        |ORDER BY user_id, start""".stripMargin,
    "graph_triangles" ->
      """WITH e AS (
        |  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
        |    GREATEST(a.l_partkey, b.l_partkey) AS b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |), n AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes
        |  FROM (SELECT a AS v FROM e UNION SELECT b FROM e) q
        |), m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
        |)
        |SELECT n.n_nodes, m.n_edges, t.n_triangles FROM n, m, t""".stripMargin,
    "text_search_conjunctive" ->
      """WITH tm AS (
        |  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        |FROM tm WHERE term IN ('query', 'window', 'scan')
        |GROUP BY doc_id
        |HAVING COUNT(DISTINCT term) = 3
        |ORDER BY doc_id""".stripMargin,
    "text_strip_html" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    '<p id="' || CAST(doc_id AS VARCHAR) || '">' ||
        |      replace(text, ' fast ', ' <b>fast</b> ') || '</p>' AS s
        |  FROM documents
        |)
        |SELECT doc_id,
        |  regexp_replace(s, '<[^>]+>', '', 'g') AS stripped,
        |  CAST(len(regexp_extract_all(s, '<[^>]+>', 0)) AS BIGINT) AS n_tags
        |FROM p ORDER BY doc_id""".stripMargin,
    "stream_transitions" -> QueriesR4.sql("q_event_transitions"),
    "q_rfm_segmentation" ->
      """WITH rfm AS (
        |  SELECT o_custkey,
        |    MAX(epoch_us(o_orderdate) // 86400000000) AS r_day,
        |    CAST(COUNT(*) AS BIGINT) AS f,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS m_cents
        |  FROM orders GROUP BY o_custkey
        |), scored AS (
        |  SELECT *,
        |    CAST(NTILE(5) OVER (ORDER BY r_day, o_custkey) AS BIGINT) AS r_score,
        |    CAST(NTILE(5) OVER (ORDER BY f, o_custkey) AS BIGINT) AS f_score,
        |    CAST(NTILE(5) OVER (ORDER BY m_cents, o_custkey) AS BIGINT) AS m_score
        |  FROM rfm
        |)
        |SELECT o_custkey, r_day, f, m_cents, r_score, f_score, m_score,
        |  r_score * 100 + f_score * 10 + m_score AS segment
        |FROM scored ORDER BY o_custkey""".stripMargin,
    "q_market_basket" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ps AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |    CAST(COUNT(*) AS BIGINT) AS support_pair
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |), its AS (
        |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS support FROM li GROUP BY 1
        |)
        |SELECT ps.part_a, ps.part_b, ps.support_pair,
        |  sa.support AS support_a, sb.support AS support_b,
        |  support_pair * 1000000 // sa.support AS conf_a_to_b_ppm,
        |  support_pair * 1000000 // sb.support AS conf_b_to_a_ppm
        |FROM ps JOIN its sa ON ps.part_a = sa.l_partkey
        |JOIN its sb ON ps.part_b = sb.l_partkey
        |ORDER BY part_a, part_b""".stripMargin,
    "q_growth_rates" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    $centsSql AS cents
         |  FROM events
         |), daily AS (
         |  SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS total
         |  FROM e GROUP BY event_type, day
         |), g AS (
         |  SELECT event_type, day, total,
         |    lag(total) OVER (PARTITION BY event_type ORDER BY day) AS prev_total
         |  FROM daily
         |)
         |SELECT event_type, day, total, prev_total,
         |  total - prev_total AS delta,
         |  (total - prev_total) * 1000000 // prev_total AS growth_ppm
         |FROM g ORDER BY event_type, day""".stripMargin,
    "q_retention_pct" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS period
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(period) AS cohort_period FROM act GROUP BY user_id
        |), r AS (
        |  SELECT c.cohort_period, a.period - c.cohort_period AS period_offset,
        |    CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
        |  FROM act a JOIN cohort c ON a.user_id = c.user_id
        |  GROUP BY 1, 2
        |), sz AS (
        |  SELECT cohort_period, n_users AS cohort_size FROM r WHERE period_offset = 0
        |)
        |SELECT r.cohort_period, r.period_offset, r.n_users, sz.cohort_size,
        |  r.n_users * 1000000 // sz.cohort_size AS retained_ppm
        |FROM r JOIN sz ON r.cohort_period = sz.cohort_period
        |ORDER BY r.cohort_period, r.period_offset""".stripMargin,
    "stream_cusum" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    $centsSql AS cents
         |  FROM events
         |), daily AS (
         |  SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS x
         |  FROM e GROUP BY event_type, day
         |), series AS (
         |  SELECT *, SUM(x) OVER (PARTITION BY event_type) //
         |    COUNT(*) OVER (PARTITION BY event_type) AS k
         |  FROM daily
         |), pfx AS (
         |  SELECT *, SUM(x - k) OVER (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
         |  FROM series
         |)
         |SELECT event_type, day,
         |  CAST(p - LEAST(0, MIN(p) OVER (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS s
         |FROM pfx ORDER BY event_type, day""".stripMargin,
    "ann_range_search" ->
      """WITH flat AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings
        |), norms AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM flat GROUP BY vec_id),
        |dots AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, SUM(q.x*c.x) AS dot
        |  FROM flat q JOIN flat c ON q.i = c.i AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id % 50 = 0
        |  GROUP BY 1, 2
        |)
        |SELECT query_id, cand_id FROM dots d
        |JOIN norms nq ON nq.vec_id = d.query_id
        |JOIN norms nc ON nc.vec_id = d.cand_id
        |WHERE dot / (nq.nrm * nc.nrm) > 0.4
        |ORDER BY query_id, cand_id""".stripMargin,
    "text_cooccur" ->
      """WITH tm AS (
        |  SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS term
        |  FROM documents
        |), v AS (
        |  SELECT doc_id, term FROM tm
        |  WHERE term IN ('query', 'window', 'scan', 'merge', 'sort', 'key')
        |)
        |SELECT a.term AS term_a, b.term AS term_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM v a JOIN v b ON a.doc_id = b.doc_id AND a.term < b.term
        |GROUP BY a.term, b.term
        |ORDER BY term_a, term_b""".stripMargin)
}
