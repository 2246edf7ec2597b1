package graft

import graft.cdc.Cdc
import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.layout.Hilbert
import graft.operators.Sampling
import graft.sketches.Kmv
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-4 extension gates: Hilbert layout, weighted sampling, exact
  * anomaly flagging, KMV set algebra, PII redaction, column-level CDC
  * audit, streaming heavy hitters, cross-source leakage. Oracle
  * discipline as everywhere: md5-portable hashing, integer/decimal
  * algebra for anything precision-sensitive, full-tiebreak ORDER BY.
  */
object QueriesR4 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dec38 = DecimalType(38, 0)

  /** R55: Hilbert-curve clustering key beside Z-order (R39) — continuous
    * space-filling walk, tighter per-file boxes (HilbertSpec measures).
    * The oracle replays the identical bit-level walk as a recursive CTE.
    */
  def hilbertCluster(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.select(col("event_id"),
        Hilbert.hvalue(col("user_id") % 4096, col("event_id") % 4096, 12).as("hval"))
      .orderBy(col("hval"), col("event_id"))
  }

  /** R53: weighted Bernoulli sample — P(keep) = min(value, 100)/100 from
    * the row's own hash, no rand(): reproducible across engines and runs
    * (the oracle draws the IDENTICAL sample). Pure pushable filter.
    */
  def qWeightedSample(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedBernoulli(
        t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
        "event_id", "value", cap = 100.0)
      .orderBy(col("event_id"))

  /** R54: anomaly flagging by a 3σ z-test with NO floating point in the
    * decision: (n·x − Σx)²·(n−1) > 9·n·(n·Σx² − (Σx)²) is the z² > 9
    * inequality cleared of divisions and square roots — exact in
    * DECIMAL(38,0) here, HUGEINT in the oracle. Spikes are injected
    * deterministically (event_id % 97 → 10× value) so the flagged set is
    * non-trivial at every SF. One aggregate + one broadcast join back.
    */
  def qAnomalyZscore(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") *
      when(col("event_id") % 97 === 0, lit(1000.0)).otherwise(lit(100.0)))
      .cast("long")
    val e = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), cents.as("cents"))
    val stats = e.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum(col("cents")).as("s1"),
      sum(col("cents") * col("cents")).as("s2"))
    val d = (col("n") * col("cents") - col("s1")).cast(dec38)
    val lhs = d * d * (col("n") - 1).cast(dec38)
    val rhs = lit(9).cast(dec38) * col("n").cast(dec38) *
      (col("n").cast(dec38) * col("s2").cast(dec38) -
        col("s1").cast(dec38) * col("s1").cast(dec38))
    e.join(broadcast(stats), Seq("event_type"))
      .filter(lhs > rhs)
      .select(col("event_id"), col("event_type"), col("cents"))
      .orderBy(col("event_id"))
  }

  /** S9: KMV set algebra — union/intersection estimates for two segments'
    * user sets from their sketches alone (see [[Kmv.setOpsReport]]).
    */
  def sketchKmvSetops(s: SparkSession, dir: String): DataFrame =
    Kmv.setOpsReport(t(s, dir, "events"), "event_type", "user_id",
      "click", "view", k = 64)

  /** T11: PII scrubbing. The corpus is deliberately PII-free, so the gate
    * INJECTS synthetic addresses/phones derived from each row's own
    * columns, then verifies the redaction output hash-exactly — the
    * pattern path is fully exercised without shipping PII-like fixture
    * data.
    */
  def textRedact(s: SparkSession, dir: String): DataFrame = {
    val withPii = concat(col("text"), lit(" reach "), col("source"),
      lit("@example.com or 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    t(s, dir, "documents")
      .select(col("doc_id"), withPii.as("s"))
      .select(col("doc_id"),
        TextFunctions.redactPii(col("s")).as("red"),
        TextFunctions.piiEmailCount(col("s")).as("n_email"),
        TextFunctions.piiPhoneCount(col("s")).as("n_phone"))
      .orderBy(col("doc_id"))
  }

  /** C24: column-level change audit between a target snapshot and a staged
    * delta (see [[Cdc.columnDiff]]). The staged fixture leaves some
    * columns unchanged per key (parity games on the key) so the diff
    * lists genuinely vary, and some keys change nothing at all — those
    * must be dropped.
    */
  def cdcColumnDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val target = o
      .filter(col("o_orderdate").cast("timestamp") <
        lit("2000-01-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("total"),
        lit("N").as("is_deleted"))
    val staged = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 2 === 0, col("o_orderstatus"))
          .otherwise(lit("U")).as("o_orderstatus"),
        (col("o_totalprice").cast(DecimalType(12, 2)) +
          when(col("o_orderkey") % 5 === 0, 0).otherwise(1000)).as("total"),
        when(col("o_orderkey") % 37 === 0, "Y").otherwise("N").as("is_deleted"))
    Cdc.columnDiff(target, staged, Seq("o_orderkey"),
        Seq("o_orderstatus", "total", "is_deleted"))
      .orderBy(col("o_orderkey"))
  }

  /** X12: streaming Misra-Gries heavy hitters — same constructed skew and
    * same guarantee oracle as the batch gate (R42), but the sketch is
    * built as mapGroupsWithState state over the replayed stream.
    */
  def streamFreqHeavy(s: SparkSession, dir: String): DataFrame = {
    val k = 16
    val items = t(s, dir, "events").select(
      when(col("user_id") % 2 === 0, col("user_id") % 5)
        .otherwise(col("user_id") + 1000000).cast("long").as("item"))
    val sk = graft.streaming.Streams.streamingFreqItems(s,
        items.select(lit("all").as("key"), col("item")), k,
        queryName = s"gate_sfreq_${System.nanoTime()}")
      .select(col("sk"))
    val exact = items.groupBy("item").agg(count(lit(1)).as("n_exact"))
    val tot = items.agg(count(lit(1)).as("n"))
    exact.crossJoin(broadcast(tot)).filter(col("n_exact") * k > col("n"))
      .crossJoin(broadcast(sk))
      .select(col("item"), col("n_exact"),
        element_at(col("sk"), col("item")).isNotNull.as("in_sketch"),
        (coalesce(element_at(col("sk"), col("item")), lit(0L)) <= col("n_exact") &&
          coalesce(element_at(col("sk"), col("item")), lit(0L)) * k >=
            col("n_exact") * k - col("n")).as("est_ok"))
      .orderBy(col("item"))
  }

  /** R56: ordered funnel — how many users complete view → click →
    * purchase IN ORDER (each stage strictly after the previous one's
    * earliest completion). Timestamps are compared as epoch
    * microseconds so both engines resolve ties identically.
    */
  def qFunnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Cohorts.funnelSummary(
      t(s, dir, "events").select(col("user_id"),
        col("event_type"), unix_micros(col("ts").cast("timestamp")).as("tsu")),
      "user_id", "event_type", "tsu", Seq("view", "click", "purchase"))

  /** R57: daily cohort retention — users belong to the epoch-day of
    * their first event; each (cohort, offset) cell counts the cohort's
    * users active that many days later. Pure integer day indices.
    */
  def qCohortRetention(s: SparkSession, dir: String): DataFrame = {
    val day = expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
    graft.operators.Cohorts.cohortRetention(
      t(s, dir, "events"), "user_id", day)
  }

  /** X13: streaming exact moments — the per-key (n, Σx, Σx²) state after
    * the replay drains must equal the batch aggregate bit-for-bit (sums
    * commute). Same cents construction as the anomaly gate, so the
    * oracle is its stats CTE.
    */
  def streamMoments(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") *
      when(col("event_id") % 97 === 0, lit(1000.0)).otherwise(lit(100.0)))
      .cast("long")
    val rows = t(s, dir, "events")
      .select(col("event_type").as("key"), cents.as("x"))
    graft.streaming.Streams.streamingMoments(s, rows,
        queryName = s"gate_smoments_${System.nanoTime()}")
      .select(col("key").as("event_type"), col("n"), col("s1"), col("s2"))
      .orderBy(col("event_type"))
  }

  /** Q1: declarative data-quality audit over orders + lineitem — one
    * aggregate pass per table, a report row per constraint (see
    * [[graft.operators.Quality]]). The fixture mixes passing contracts
    * with deliberately violated ones (tightened range, shrunk domain) so
    * both report polarities are exercised.
    */
  def dqConstraints(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quality._
    val orders = report(t(s, dir, "orders"), "orders", Seq(
      notNull("o_orderkey"), unique("o_orderkey"),
      inSet("o_orderstatus", Seq("O", "F", "P")),
      inSet("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM")),
      inRange("o_totalprice", lit(0), lit(100000)),
      notNull("o_orderdate")))
    val lineitem = report(t(s, dir, "lineitem"), "lineitem", Seq(
      notNull("l_orderkey"),
      inRange("l_quantity", lit(1), lit(50)),
      inRange("l_discount", lit(0), lit(0.04)),
      inSet("l_returnflag", Seq("A", "N", "R"))))
    orders.unionByName(lineitem).orderBy(col("check_name"))
  }

  /** R58: session transition matrix — counts of (prev event type → next
    * event type) steps within a user's 30-minute session continuity,
    * ordered by event_id like the sessionize gate. The Markov-chain view
    * of the event stream: one window pass + one aggregate.
    */
  def qEventTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    e.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap", col("ts_sec") - lag(col("ts_sec"), 1).over(w))
      .filter(col("prev_type").isNotNull && col("gap") <= 1800)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .select(col("prev_type"), col("event_type").as("next_type"),
        col("n_transitions"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** D11: minhash Jaccard estimates for the LSH candidate pairs (see
    * [[Dedup.minhashAgreement]]) — integer agreement counts, bit-exact
    * against the oracle's reconstruction of the same signatures.
    */
  def dedupMinhashEstimate(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashAgreement(t(s, dir, "documents"), col("doc_id"), col("text"),
      shingleWords = 3, k = 12, bands = 4)

  /** R45b: CM-sketch equi-join cardinality estimate — |events ⋈ orders
    * ON user| from the two counter tables alone (see
    * [[graft.sketches.CountMin.joinSizeEstimate]]), beside the exact
    * join size and the never-underestimate guarantee. Both sides carry
    * real multiplicity (events per user × orders per customer), so the
    * inner product is non-trivial.
    */
  def sketchCmJoinSize(s: SparkSession, dir: String): DataFrame = {
    import graft.sketches.CountMin
    val a = CountMin.counters(t(s, dir, "events"), col("user_id"))
    val b = CountMin.counters(t(s, dir, "orders"), col("o_custkey"))
    val est = CountMin.joinSizeEstimate(a, b)
    val exact = t(s, dir, "events").groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("na"))
      .join(t(s, dir, "orders").groupBy(col("o_custkey").as("k2"))
        .agg(count(lit(1)).as("nb")), col("k") === col("k2"))
      .agg(sum(col("na") * col("nb")).cast("long").as("exact_join_size"))
    est.crossJoin(exact)
      .select(col("est_join_size"), col("exact_join_size"),
        (col("est_join_size") >= col("exact_join_size")).as("never_under"))
  }

  /** X14: streaming ordered funnel — per-user O(stages) state under the
    * event-time-ordered delivery contract (see
    * [[graft.streaming.Streams.streamingFunnel]]); the drained chains
    * aggregate to the SAME summary as the batch funnel, so the oracle is
    * q_funnel's.
    */
  def streamFunnel(s: SparkSession, dir: String): DataFrame = {
    val stages = Seq("view", "click", "purchase")
    val rows = t(s, dir, "events")
      .filter(col("event_type").isin(stages.map(x => x: Any): _*))
      .select(col("user_id").as("user"),
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2).otherwise(3).as("stage"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
    val chains = graft.streaming.Streams.streamingFunnel(s, rows, 3,
      queryName = s"gate_sfunnel_${System.nanoTime()}")
    val counts = chains.agg(
      coalesce(sum(when(element_at(col("stage_ts"), 1) =!= 0L, 1L).otherwise(0L)), lit(0L)).as("n1"),
      coalesce(sum(when(element_at(col("stage_ts"), 2) =!= 0L, 1L).otherwise(0L)), lit(0L)).as("n2"),
      coalesce(sum(when(element_at(col("stage_ts"), 3) =!= 0L, 1L).otherwise(0L)), lit(0L)).as("n3"))
    val stageRows = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).cast("long").as("stage"), lit(st).as("stage_name"),
        col(s"n${i + 1}").as("n_users"))
    }
    counts.select(explode(array(stageRows: _*)).as("s"))
      .select(col("s.stage"), col("s.stage_name"), col("s.n_users"))
      .orderBy(col("stage"))
  }

  /** R38b: incremental t-digest maintenance — half the data's per-group
    * digest STATES persisted to parquet, the other half's states merged
    * in without re-reading history (the R44-incremental pattern applied
    * to quantiles); the merged estimates must satisfy the same ±2% rank
    * bound as the single-pass gate, so the oracle is shared.
    */
  def sketchTdigestIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.sketches.TDigest
    val e = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value").cast("double").as("v"))
    def states(df: DataFrame) = df.groupBy("event_type")
      .agg(TDigest.digestState(col("v")).as("sk"))
    val store = java.nio.file.Files.createTempDirectory("graft_td_inc").toString
    states(e.filter(col("event_id") % 2 === 0)).write.mode("overwrite").parquet(store)
    val merged = s.read.parquet(store)
      .unionByName(states(e.filter(col("event_id") % 2 =!= 0)))
    val est = merged.groupBy("event_type")
      .agg(TDigest.mergeQuantiles(col("sk"), Seq(0.5, 0.95)).as("qs"))
      .select(col("event_type").as("et"),
        col("qs").getItem(0).as("p50_est"), col("qs").getItem(1).as("p95_est"))
    e.join(est, col("event_type") === col("et"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") <= col("p50_est"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("v") <= col("p95_est"), 1L).otherwise(0L)).as("le95"))
      .select(col("event_type"), col("n"),
        (abs(col("le50") / col("n") - 0.5) < 0.02).as("p50_ok"),
        (abs(col("le95") / col("n") - 0.95) < 0.02).as("p95_ok"))
      .orderBy(col("event_type"))
  }

  /** D10: cross-source near-dup leakage matrix over the LSH pair list
    * (see [[Dedup.crossSourceMatrix]]); oracle = the minhash-LSH pair
    * oracle aggregated by source pair.
    */
  def dedupCrossSource(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val pairs = Dedup.lshCandidates(d, col("doc_id"), col("text"),
      shingleWords = 3, k = 12, bands = 4)
    Dedup.crossSourceMatrix(d, pairs, "doc_id", "source")
  }

  /** T12: inverted index — term → document-frequency + sorted posting
    * list, the IR primitive behind decontamination lookups and
    * targeted corpus queries ("all docs containing X") without a full
    * scan per probe. One explode + one aggregate; posting lists are
    * flattened to comma-joined strings for the cross-engine hash (the
    * established array-gate idiom). The df floor bounds the gated output
    * to common terms; production keeps the full index partitioned by
    * term.
    */
  def textInvertedIndex(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"),
        concat_ws(",",
          transform(sort_array(collect_set(col("doc_id"))), _.cast("string")))
          .as("postings"))
      .filter(col("df") >= 50)
      .orderBy(col("term"))
  }

  /** T13: deterministic train/val/test split — 80/10/10 by hash bucket of
    * the document id, so the assignment is stable under re-runs, appends,
    * and engine changes (the property that keeps eval sets eval sets).
    * Reported per (source, split) with document and character counts.
    */
  def qDatasetSplit(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents")
      .withColumn("__h", Kmv.hash48(col("doc_id")))
      .withColumn("__bucket", expr(s"(__h * 10) div ${Kmv.HashRange}"))
      .withColumn("split",
        when(col("__bucket") < 8, "train")
          .when(col("__bucket") === 8, "val").otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_chars_total"))
      .orderBy(col("source"), col("split"))
  }

  /** E1: entity-resolution composite — variant construction (injected
    * single-char deletions, so the fuzzy path has REAL work at every SF,
    * unlike the corpus's naturally fuzz-free documents) → prefix-FAMILY +
    * length-band blocking → banded Levenshtein pair verification (≤2) →
    * large-star/small-star connected components → min-id survivorship.
    * One oracle over the whole pipeline, like corpus_clean.
    *
    * Blocking (r8, scale-safe): each entity emits its natural-key digit
    * prefix truncated by 0, 1 and 2 trailing chars (floored at
    * min(3, digits) chars); candidates share any key. Recall is exact for
    * the injected variants (deletions land past the digit prefix, so the
    * full-digits key never moves), and the deliberate naive-key false
    * merges survive (123 vs 1230 share key "123" — exactly the false
    * merge naive name-keying produces, the reason survivorship reports
    * beat silent dedup). Unlike the r4 fixed-3-char-prefix key, the block
    * population for ANY key is bounded by construction — a key of length
    * L only collects digit strings of length L..L+2 that extend it, i.e.
    * ≤ 111 masters + their ≤ 111 variants — so candidate volume stays
    * linear in n at any scale (spec-pinned). The Levenshtein verification
    * is fenced() so Catalyst cannot substitute it into the join condition,
    * where it would run on every raw block pair ahead of the cheap
    * id/length conjuncts (measured 7.6 s → 0.7 s at sf0.1).
    */
  def entityResolution(s: SparkSession, dir: String): DataFrame = {
    val entities = erEntities(s, dir)
    val keyed = erKeyed(entities)
    val a = keyed.select(col("ent_id").as("id_a"), col("name").as("name_a"),
      col("blk"), col("len").as("len_a"))
    val b = keyed.select(col("ent_id").as("id_b"), col("name").as("name_b"),
      col("blk").as("blk_b"), col("len").as("len_b"))
    val pairs = a.join(b, col("blk") === col("blk_b") && col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= 2)
      .select(col("id_a"), col("id_b"),
        graft.functions.NativeExpressions.fenced(
          levenshtein(col("name_a"), col("name_b"), 2).cast("long")).as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= 2)
      .select(col("id_a"), col("id_b")).distinct()
    val clusters = Dedup.connectedComponentsStar(pairs)
      .select(col("doc_id").as("cid"), col("cluster_id"))
    entities.join(clusters, col("ent_id") === col("cid"), "left")
      .select(col("ent_id"),
        coalesce(col("cluster_id"), col("ent_id")).as("cluster_id"))
      .withColumn("is_survivor", col("ent_id") === col("cluster_id"))
      .orderBy(col("ent_id"))
  }

  /** E1 fixture: masters + injected single-char-deletion variants. */
  private[graft] def erEntities(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer").select(col("c_custkey").cast("long").as("ent_id"),
      concat(col("c_custkey").cast("string"),
        lit("## master entity record alpha")).as("name"))
    val variants = base.filter(col("ent_id") % 7 === 0)
      .withColumn("p",
        length(col("ent_id").cast("string")) + lit(2) + (col("ent_id") % 10).cast("int"))
      .select((col("ent_id") + 1000000L).as("ent_id"),
        expr("concat(substring(name, 1, p), substring(name, p + 2, 100))").as("name"))
    base.unionByName(variants)
  }

  /** E1 blocking keys: digit prefix truncated by 0..2 trailing chars,
    * floored at min(3, #digits) chars; one row per (entity, key).
    * Block-size bound (spec-pinned): a key of length L is only emitted by
    * digit strings of length L..L+2 extending it → ≤ 111 masters + ≤ 111
    * variants per block, independent of n.
    */
  private[graft] def erKeyed(entities: DataFrame): DataFrame =
    entities
      .withColumn("d", locate("#", col("name")) - 1)
      .withColumn("len", length(col("name")))
      .withColumn("blk", explode(array_distinct(array(
        expr("substring(name, 1, d)"),
        expr("substring(name, 1, greatest(least(d, 3), d - 1))"),
        expr("substring(name, 1, greatest(least(d, 3), d - 2))")))))
      .select(col("ent_id"), col("name"), col("len"), col("blk"))

  // ---------------------------------------------------------------- oracle

  private val hash48Sql =
    "CAST(('0x' || substr(md5(CAST(%s AS VARCHAR)), 1, 12)) AS BIGINT)"

  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phonePat = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** Shared by q_funnel (batch) and stream_funnel (X14): the two
    * formulations must produce the identical summary.
    */
  private[graft] val funnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events
      |), u AS (SELECT DISTINCT user_id FROM e),
      |s1 AS (
      |  SELECT user_id, MIN(tsu) AS t1 FROM e WHERE event_type = 'view'
      |  GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, MIN(tsu) AS t2
      |  FROM e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE event_type = 'click' AND tsu > t1 GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, MIN(tsu) AS t3
      |  FROM e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE event_type = 'purchase' AND tsu > t2 GROUP BY e.user_id
      |), c AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
      |         (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
      |         (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n3
      |)
      |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name, n1 AS n_users FROM c
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'click', n2 FROM c
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), 'purchase', n3 FROM c
      |ORDER BY stage""".stripMargin

  val sql: Map[String, String] = Map(
    "hilbert_cluster" ->
      """WITH RECURSIVE walk AS (
        |  SELECT event_id, user_id % 4096 AS x, event_id % 4096 AS y,
        |    CAST(0 AS BIGINT) AS d, CAST(2048 AS BIGINT) AS s
        |  FROM events
        |  UNION ALL
        |  SELECT event_id,
        |    CASE WHEN (y & s) = 0
        |      THEN CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END ELSE x END,
        |    CASE WHEN (y & s) = 0
        |      THEN CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END ELSE y END,
        |    d + s * s * (CASE WHEN (x & s) > 0
        |                   THEN CASE WHEN (y & s) > 0 THEN 2 ELSE 3 END
        |                   ELSE CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END END),
        |    s // 2
        |  FROM walk WHERE s > 0
        |)
        |SELECT event_id, d AS hval FROM walk WHERE s = 0
        |ORDER BY hval, event_id""".stripMargin,
    "q_weighted_sample" ->
      s"""SELECT event_id, event_type, value FROM events
         |WHERE ${hash48Sql.format("event_id")}
         |  < CAST(FLOOR((281474976710656e0 * LEAST(value, 100.0)) / 100.0) AS BIGINT)
         |ORDER BY event_id""".stripMargin,
    "q_anomaly_zscore" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(ROUND(value * (CASE WHEN event_id % 97 = 0 THEN 1000.0 ELSE 100.0 END)) AS BIGINT) AS cents
        |  FROM events
        |), st AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS s1,
        |    CAST(SUM(cents * cents) AS BIGINT) AS s2
        |  FROM e GROUP BY event_type
        |)
        |SELECT e.event_id, e.event_type, e.cents
        |FROM e JOIN st ON e.event_type = st.event_type
        |WHERE CAST(n * cents - s1 AS HUGEINT) * CAST(n * cents - s1 AS HUGEINT)
        |        * CAST(n - 1 AS HUGEINT)
        |    > CAST(9 AS HUGEINT) * CAST(n AS HUGEINT)
        |        * (CAST(n AS HUGEINT) * CAST(s2 AS HUGEINT)
        |           - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT))
        |ORDER BY event_id""".stripMargin,
    "sketch_kmv_setops" ->
      s"""WITH va AS (SELECT DISTINCT user_id AS v FROM events WHERE event_type = 'click'),
         |vb AS (SELECT DISTINCT user_id AS v FROM events WHERE event_type = 'view'),
         |ha AS (SELECT DISTINCT ${hash48Sql.format("v")} AS h FROM va),
         |hb AS (SELECT DISTINCT ${hash48Sql.format("v")} AS h FROM vb),
         |sa AS (SELECT h FROM ha ORDER BY h LIMIT 64),
         |sb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
         |merged AS (
         |  SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb) u
         |  ORDER BY h LIMIT 64
         |), m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(MAX(h) AS BIGINT) AS theta
         |  FROM merged
         |), est AS (
         |  SELECT m, CASE WHEN m < 64 THEN m
         |              ELSE CAST(17732923532771328 AS BIGINT) // theta END AS union_est
         |  FROM m
         |), x AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS x_common FROM merged
         |  WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)
         |), ex AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
         |    CAST(SUM(CASE WHEN ng = 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
         |  FROM (SELECT v, COUNT(DISTINCT g) AS ng
         |        FROM (SELECT 'a' AS g, v FROM va UNION ALL SELECT 'b', v FROM vb) z
         |        GROUP BY v) q
         |)
         |SELECT 'click' AS set_a, 'view' AS set_b,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sa) AS n_a,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sb) AS n_b,
         |  x.x_common,
         |  est.union_est,
         |  CASE WHEN est.m < 64 THEN x.x_common
         |    ELSE (x.x_common * est.union_est) // 64 END AS inter_est,
         |  ex.exact_union, ex.exact_inter
         |FROM est, x, ex""".stripMargin,
    "text_redact" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    text || ' reach ' || source || '@example.com or 555-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS s
         |  FROM documents
         |)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(s, '$emailPat', '<EMAIL>', 'g'),
         |    '$phonePat', '<PHONE>', 'g') AS red,
         |  CAST(len(regexp_extract_all(s, '$emailPat', 0)) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(s, '$phonePat', 0)) AS BIGINT) AS n_phone
         |FROM p ORDER BY doc_id""".stripMargin,
    "cdc_column_diff" ->
      """WITH tgt AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice AS DECIMAL(12,2)) AS total, 'N' AS is_deleted
        |  FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |), stg AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 2 = 0 THEN o_orderstatus ELSE 'U' END AS o_orderstatus,
        |    CAST(o_totalprice AS DECIMAL(12,2)) +
        |      CASE WHEN o_orderkey % 5 = 0 THEN 0 ELSE 1000 END AS total,
        |    CASE WHEN o_orderkey % 37 = 0 THEN 'Y' ELSE 'N' END AS is_deleted
        |  FROM orders WHERE o_orderkey % 3 = 0
        |), j AS (
        |  SELECT t.o_orderkey,
        |    concat_ws(',',
        |      CASE WHEN t.o_orderstatus IS DISTINCT FROM s.o_orderstatus THEN 'o_orderstatus' END,
        |      CASE WHEN t.total IS DISTINCT FROM s.total THEN 'total' END,
        |      CASE WHEN t.is_deleted IS DISTINCT FROM s.is_deleted THEN 'is_deleted' END
        |    ) AS changed_cols
        |  FROM tgt t JOIN stg s ON t.o_orderkey = s.o_orderkey
        |)
        |SELECT o_orderkey, changed_cols FROM j WHERE changed_cols <> ''
        |ORDER BY o_orderkey""".stripMargin,
    "stream_freq_heavy" -> QueriesR3.sql("sketch_freq_heavy"),
    "stream_funnel" -> funnelSql,
    "entity_resolution" ->
      """WITH RECURSIVE base AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS ent_id,
        |    CAST(c_custkey AS VARCHAR) || '## master entity record alpha' AS name
        |  FROM customer
        |), variants AS (
        |  SELECT ent_id + 1000000 AS ent_id,
        |    substr(name, 1, p) || substr(name, p + 2, 100) AS name
        |  FROM (SELECT ent_id, name,
        |          length(CAST(ent_id AS VARCHAR)) + 2 + CAST(ent_id % 10 AS INT) AS p
        |        FROM base WHERE ent_id % 7 = 0) v
        |), entities AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM variants
        |), keyed AS (
        |  SELECT DISTINCT ent_id, name, length(name) AS len,
        |    substr(name, 1, greatest(least(d, 3), d - t.off)) AS blk
        |  FROM (SELECT ent_id, name, strpos(name, '#') - 1 AS d FROM entities) e,
        |       (VALUES (0), (1), (2)) t(off)
        |), pairs AS (
        |  SELECT DISTINCT a.ent_id AS id_a, b.ent_id AS id_b
        |  FROM keyed a JOIN keyed b
        |    ON a.blk = b.blk
        |    AND a.ent_id < b.ent_id
        |    AND abs(a.len - b.len) <= 2
        |  WHERE levenshtein(a.name, b.name) <= 2
        |), sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION
        |  SELECT id_b, id_a FROM pairs
        |), reach(id, lbl) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT s.src, r.lbl FROM reach r JOIN sym s ON s.dst = r.id
        |), clusters AS (
        |  SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id
        |)
        |SELECT e.ent_id,
        |  COALESCE(c.cluster_id, e.ent_id) AS cluster_id,
        |  e.ent_id = COALESCE(c.cluster_id, e.ent_id) AS is_survivor
        |FROM entities e LEFT JOIN clusters c ON e.ent_id = c.id
        |ORDER BY ent_id""".stripMargin,
    "sketch_tdigest_incremental" -> QueriesR3.sql("sketch_tdigest_rank"),
    "sketch_cm_join_size" -> {
      def bucket(itemExpr: String) =
        s"CAST(('0x' || substr(md5(CAST(ds.d AS VARCHAR) || ':' || CAST($itemExpr AS VARCHAR)), 1, 12)) AS BIGINT) % 512"
      s"""WITH ds AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(d)),
         |ca AS (
         |  SELECT ds.d AS d, ${bucket("e.user_id")} AS bucket, COUNT(*) AS cnt
         |  FROM events e CROSS JOIN ds GROUP BY 1, 2
         |), cb AS (
         |  SELECT ds.d AS d, ${bucket("o.o_custkey")} AS bucket, COUNT(*) AS cnt
         |  FROM orders o CROSS JOIN ds GROUP BY 1, 2
         |), ip AS (
         |  SELECT ca.d, SUM(ca.cnt * cb.cnt) AS ip
         |  FROM ca JOIN cb ON ca.d = cb.d AND ca.bucket = cb.bucket
         |  GROUP BY ca.d
         |), est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size FROM ip),
         |ex AS (
         |  SELECT CAST(SUM(na * nb) AS BIGINT) AS exact_join_size
         |  FROM (SELECT user_id AS k, COUNT(*) AS na FROM events GROUP BY 1) x
         |  JOIN (SELECT o_custkey AS k, COUNT(*) AS nb FROM orders GROUP BY 1) y
         |    ON x.k = y.k
         |)
         |SELECT est.est_join_size, ex.exact_join_size,
         |  est.est_join_size >= ex.exact_join_size AS never_under
         |FROM est, ex""".stripMargin
    },
    "q_funnel" -> funnelSql,
    "q_cohort_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS period
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(period) AS cohort_period FROM act GROUP BY user_id
        |)
        |SELECT c.cohort_period, a.period - c.cohort_period AS period_offset,
        |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM act a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY c.cohort_period, a.period - c.cohort_period
        |ORDER BY cohort_period, period_offset""".stripMargin,
    "dq_constraints" ->
      """WITH o AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_nn,
        |    CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_uq,
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL
        |      OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_st,
        |    CAST(SUM(CASE WHEN o_orderpriority IS NULL
        |      OR o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM') THEN 1 ELSE 0 END) AS BIGINT) AS v_pr,
        |    CAST(SUM(CASE WHEN o_totalprice IS NULL
        |      OR o_totalprice < 0 OR o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS v_tp,
        |    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_od
        |  FROM orders
        |), l AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_nn,
        |    CAST(SUM(CASE WHEN l_quantity IS NULL
        |      OR l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qt,
        |    CAST(SUM(CASE WHEN l_discount IS NULL
        |      OR l_discount < 0 OR l_discount > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS v_di,
        |    CAST(SUM(CASE WHEN l_returnflag IS NULL
        |      OR l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS v_rf
        |  FROM lineitem
        |)
        |SELECT * FROM (
        |  SELECT 'orders.not_null(o_orderkey)' AS check_name, v_nn AS n_violations, v_nn = 0 AS passed FROM o
        |  UNION ALL SELECT 'orders.unique(o_orderkey)', v_uq, v_uq = 0 FROM o
        |  UNION ALL SELECT 'orders.in_set(o_orderstatus)', v_st, v_st = 0 FROM o
        |  UNION ALL SELECT 'orders.in_set(o_orderpriority)', v_pr, v_pr = 0 FROM o
        |  UNION ALL SELECT 'orders.in_range(o_totalprice)', v_tp, v_tp = 0 FROM o
        |  UNION ALL SELECT 'orders.not_null(o_orderdate)', v_od, v_od = 0 FROM o
        |  UNION ALL SELECT 'lineitem.not_null(l_orderkey)', v_nn, v_nn = 0 FROM l
        |  UNION ALL SELECT 'lineitem.in_range(l_quantity)', v_qt, v_qt = 0 FROM l
        |  UNION ALL SELECT 'lineitem.in_range(l_discount)', v_di, v_di = 0 FROM l
        |  UNION ALL SELECT 'lineitem.in_set(l_returnflag)', v_rf, v_rf = 0 FROM l
        |) r ORDER BY check_name""".stripMargin,
    "q_event_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |  FROM events
        |), m AS (
        |  SELECT event_type, lag(event_type) OVER w AS prev_type,
        |    ts_sec - lag(ts_sec) OVER w AS gap
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |)
        |SELECT prev_type, event_type AS next_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_transitions
        |FROM m WHERE prev_type IS NOT NULL AND gap <= 1800
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, next_type""".stripMargin,
    "dedup_minhash_estimate" -> {
      val agreeSum = (0 until 12).map(j =>
        s"(CASE WHEN x.h$j = y.h$j THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH ${QueriesData.minhashCtes},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
         |)
         |SELECT c.id_a, c.id_b, CAST($agreeSum AS BIGINT) AS n_agree,
         |  CAST(12 AS BIGINT) AS k_total
         |FROM cand c
         |JOIN mh x ON c.id_a = x.doc_id
         |JOIN mh y ON c.id_b = y.doc_id
         |ORDER BY id_a, id_b""".stripMargin
    },
    "stream_moments" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(ROUND(value * (CASE WHEN event_id % 97 = 0 THEN 1000.0 ELSE 100.0 END)) AS BIGINT) AS cents
        |  FROM events
        |)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS s1,
        |  CAST(SUM(cents * cents) AS BIGINT) AS s2
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "text_inverted_index" ->
      """WITH tm AS (
        |  SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS term
        |  FROM documents
        |)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM tm GROUP BY term HAVING COUNT(*) >= 50
        |ORDER BY term""".stripMargin,
    "q_dataset_split" ->
      s"""WITH d AS (
         |  SELECT source, n_chars,
         |    (${hash48Sql.format("doc_id")} * 10) // ${Kmv.HashRange} AS bucket
         |  FROM documents
         |)
         |SELECT source,
         |  CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'
         |    ELSE 'test' END AS split,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
         |FROM d GROUP BY source, split
         |ORDER BY source, split""".stripMargin,
    "dedup_cross_source" ->
      s"""WITH pr AS (${QueriesData.sql("dedup_minhash_lsh")}),
         |m AS (
         |  SELECT LEAST(da.source, db.source) AS source_a,
         |         GREATEST(da.source, db.source) AS source_b
         |  FROM pr
         |  JOIN documents da ON pr.id_a = da.doc_id
         |  JOIN documents db ON pr.id_b = db.doc_id
         |)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM m GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin)
}
