package graft

import graft.PlanProbe.CkptOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.layout.{FileManifest, ZOrder}
import graft.sources.Tables

/** Round-4 continuation batch y: the r5+ queue — k-core/k-truss HIERARCHY
  * labeling (coreness R94, trussness R95), incremental Z-order/manifest
  * maintenance (F11), and the streaming k-anonymity monitor (X24).
  * Oracle discipline as everywhere: DuckDB SQL on the same parquet,
  * integer-exact, columns aliased identically on both sides.
  */
object QueriesR9 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** R94: coreness labeling over the co-purchase graph (see
    * [[graft.operators.Graph.coreness]]) — every product's k-core level
    * in one nested peel sweep (levels 2..4, 3 rounds each), instead of
    * re-running the single-k peel per candidate k.
    */
  def graphCoreness(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.coreness(
        QueriesR6.coPurchaseEdges(s, dir),
        maxK = 4, roundsPerLevel = 3)
      .orderBy(col("node"))

  /** R95: trussness labeling (see [[graft.operators.Graph.trussness]]) —
    * per-EDGE corroboration level of the co-purchase graph (levels 3..4,
    * 2 support rounds each); bridges stay at 2, triangle-reinforced
    * edges stratify upward.
    */
  def graphTrussness(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.trussness(
        QueriesR6.coPurchaseEdges(s, dir),
        maxK = 4, roundsPerLevel = 2)
      .orderBy(col("a"), col("b"))

  /** F11: incremental Z-order maintenance — base written clustered with
    * a committed manifest version, a delta appended as fresh z-sorted
    * files ([[ZOrder.appendClustered]]), the manifest extended from a
    * DELTA-ONLY scan ([[FileManifest.buildFiles]] + appendVersion), then
    * a 2-D box-pruned scan over the merged manifest. The gate pins the
    * no-false-negative contract end-to-end: pruned scan over base+delta
    * ≡ a plain filter over the whole table. IncrementalLayoutSpec pins
    * the pruning effect and the version history.
    */
  def zorderIncremental(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val base = e.filter(col("event_id") % 10 =!= 0)
    val delta = e.filter(col("event_id") % 10 === 0)
    val store = java.nio.file.Files
      .createTempDirectory("graft_zinc").toString
    val dataDir = s"$store/data"
    val root = s"$store/manifest"
    val z = ZOrder.zvalue(pmod(col("user_id"), lit(4096)),
      pmod(col("event_id"), lit(4096)), 12)
    ZOrder.writeClustered(base, dataDir, z, 8)
    FileManifest.commitVersion(
      FileManifest.build(s, dataDir, Seq("user_id", "event_id"), Nil), root)
    val newFiles = ZOrder.appendClustered(delta, dataDir, z, 2)
    FileManifest.appendVersion(s, root,
      FileManifest.buildFiles(s, newFiles, Seq("user_id", "event_id"), Nil))
    val (_, _, scanned) = FileManifest.prunedScan(s, dataDir,
      FileManifest.readVersion(s, root),
      ranges = Map("user_id" -> (2L, 9L), "event_id" -> (100L, 700L)),
      equalities = Map.empty)
    scanned.select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** X24: streaming k-anonymity monitor (see
    * [[graft.streaming.Streams.streamingKAnonymity]]) — Q3's risk report
    * maintained from per-(type, day) distinct-user state; shares Q3's
    * oracle.
    */
  def streamKAnonymity(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"),
      col("user_id"))
    graft.streaming.Streams.streamingKAnonymity(s, e, k = 5,
        queryName = s"gate_skanon_${System.nanoTime()}")
      .orderBy(col("event_type"))
  }

  /** D14: exact substring-overlap dedup (see
    * [[graft.dedup.Dedup.substringOverlap]]) — doc pairs sharing ≥ 2
    * distinct 8-token windows, with the longest contiguous shared run
    * reported in tokens; boilerplate windows (> 50 docs) dropped before
    * pair generation.
    */
  def dedupSubstring(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.dedup.Dedup.substringOverlap(d, col("doc_id"), col("text"),
        w = 8, minShared = 2, hotCap = 50)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C33: multi-master conflict detection (see
    * [[graft.cdc.Cdc.detectConflicts]]) — the event stream split into
    * two sources by change-id parity (modeling bidirectional
    * replication), conflicts = both sources touching a user within the
    * same hour, resolution = last-writer-wins on (ts, seq). The per-user
    * report: buckets, conflicts, wins per source (winner parity IS the
    * source), last conflict hour.
    */
  def cdcConflicts(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"))
    val upd = e.withColumn("src",
      when(col("event_id") % 2 === 0, "a").otherwise("b"))
    graft.cdc.Cdc.detectConflicts(upd, col("user_id"), col("ts_sec"),
        col("event_id"), col("src"), bucketSec = 3600L)
      .groupBy(col("pk").as("user_id"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("is_conflict"), 1L).otherwise(0L)).as("n_conflicts"),
        sum(when(col("is_conflict") && col("winner_seq") % 2 === 0, 1L)
          .otherwise(0L)).as("n_wins_a"),
        sum(when(col("is_conflict") && col("winner_seq") % 2 === 1, 1L)
          .otherwise(0L)).as("n_wins_b"),
        max(when(col("is_conflict"), col("bucket"))).as("last_conflict_bucket"))
      .orderBy(col("user_id"))
  }

  /** X25: streaming class-balance monitor (see
    * [[graft.streaming.Streams.streamingClassBalance]]) — R83 from one
    * long of state per label; shares R83's oracle.
    */
  def streamClassBalance(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.streamingClassBalance(s,
        t(s, dir, "embeddings").select(col("label")),
        queryName = s"gate_sclassbal_${System.nanoTime()}")
      .orderBy(col("label"))

  /** T23: Heaps-law vocabulary growth — cumulative corpus tokens vs
    * cumulative distinct vocabulary at every doc checkpoint (doc_id
    * ingest order). New-type detection is one corpus-first-occurrence
    * window on the token key; the GLOBAL running totals run through
    * [[graft.operators.PrefixSum.prefixSums]] — per-bucket partials,
    * bucket-offset broadcast, intra-bucket windows — so no data-sized
    * single-partition sort exists in the plan (the sub-linear curve is
    * the dedup/quality health signal: a linear vocab curve means ID-like
    * garbage tokens are flooding the vocabulary).
    */
  def textHeaps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val wFirst = Window.partitionBy(col("tok"))
      .orderBy(col("doc_id"), col("pos"))
    val perDoc = tok
      .withColumn("is_new",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("is_new")).as("n_new"))
    graft.operators.PrefixSum.prefixSums(perDoc, col("doc_id"),
        Seq("tokens" -> col("n_tok"), "vocab" -> col("n_new")),
        bucketWidth = 64L)
      .select(col("doc_id"), col("cum_tokens"), col("cum_vocab"))
      .orderBy(col("doc_id"))
  }

  /** R96: item-item Jaccard similarity (see
    * [[graft.operators.Basket.itemJaccard]]) with the top-3 similar
    * items per item served through the native grouped top-k operator —
    * the normalized companion of `q_also_bought` (co-counts rank
    * popularity; Jaccard ranks affinity).
    */
  def qItemSimilarity(s: SparkSession, dir: String): DataFrame = {
    val baskets = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
    val jac = graft.operators.Basket.itemJaccard(baskets, minPairSupport = 3L)
      .ckpt // feeds both directions of the symmetrization
    val sym = jac
      .select(col("part_a").as("item"), col("part_b").as("co_item"),
        col("n_inter"), col("n_union"), col("jaccard_ppm"))
      .unionAll(jac.select(col("part_b"), col("part_a"),
        col("n_inter"), col("n_union"), col("jaccard_ppm")))
    graft.plans.GroupedTopK.topK(sym, Seq("item"),
        col("jaccard_ppm"), col("co_item"), k = 3, rankName = "rnk")
      .select(col("item"), col("co_item"), col("n_inter"), col("n_union"),
        col("jaccard_ppm"), col("rnk"))
      .orderBy(col("item"), col("rnk"))
  }

  /** R98: 3-clique percolation communities (see
    * [[graft.operators.Graph.cliquePercolation3]]) over the minhash-LSH
    * near-dup candidate graph — overlapping duplicate-group communities
    * that never leak across bridge edges (the same fixture and band
    * parameters as `dedup_cluster`, whose plain CC merges across them).
    */
  def graphPercolation(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val pairs = graft.dedup.Dedup.lshCandidates(d, col("doc_id"), col("text"),
      shingleWords = 3, k = 12, bands = 4)
    graft.operators.Graph.cliquePercolation3(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .orderBy(col("node"), col("community"))
  }

  /** X26: streaming backfill-gap monitor (see
    * [[graft.streaming.Streams.streamingBackfillGaps]]) — C28's planner
    * as a live feed-health alarm; shares C28's oracle.
    */
  def streamBackfillGaps(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("hr"))
    graft.streaming.Streams.streamingBackfillGaps(s, e,
        queryName = s"gate_sbackfill_${System.nanoTime()}")
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- oracle

  /** Straight-line nested coreness peel: levels 2..4 over the
    * co-purchase graph, each level 3 unrolled rounds of (degree-k
    * survivor set, both-endpoint restriction) starting from the previous
    * level's residue; coreness = max level whose residue contains the
    * node. Same fixed-round contract as `graph_kcore`.
    */
  private val corenessSql = {
    // AS MATERIALIZED: each CTE is referenced ~3× by the next round, so
    // default inlining expands the 9-round chain 3^9-fold (and re-opens
    // the parquet per copy — fd exhaustion, not just slowness)
    def level(k: Int, prev: String): String =
      (1 to 3).map { r =>
        val p = if (r == 1) prev else s"l${k}e${r - 1}"
        s"""l${k}k$r AS MATERIALIZED (
           |  SELECT src FROM $p GROUP BY src HAVING COUNT(*) >= $k),
           |l${k}e$r AS MATERIALIZED (
           |  SELECT e.src, e.dst FROM $p e
           |  JOIN l${k}k$r x ON e.src = x.src JOIN l${k}k$r y ON e.dst = y.src
           |)""".stripMargin
      }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |und AS (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |), e0 AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM und
       |  UNION ALL SELECT b, a FROM und
       |),
       |${level(2, "e0")},
       |${level(3, "l2e3")},
       |${level(4, "l3e3")},
       |m AS (
       |  SELECT src AS node, 1 AS lvl FROM e0
       |  UNION ALL SELECT src, 2 FROM l2e3
       |  UNION ALL SELECT src, 3 FROM l3e3
       |  UNION ALL SELECT src, 4 FROM l4e3
       |)
       |SELECT node, CAST(MAX(lvl) AS BIGINT) AS coreness
       |FROM m GROUP BY node ORDER BY node""".stripMargin
  }

  /** Straight-line nested trussness peel: levels 3..4, each 2 unrolled
    * support rounds (common-neighbor count, sup ≥ k−2 filter) from the
    * previous level's residue; trussness = max surviving level, base 2.
    */
  private val trussnessSql = {
    // AS MATERIALIZED for the same inlining-blowup reason as corenessSql
    def level(k: Int, prev: String): String =
      (1 to 2).map { r =>
        val p = if (r == 1) prev else s"t${k}e${r - 1}"
        s"""t${k}d$r AS MATERIALIZED (
           |  SELECT a AS src, b AS dst FROM $p UNION ALL SELECT b, a FROM $p
           |), t${k}s$r AS MATERIALIZED (
           |  SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS sup FROM $p e
           |  JOIN t${k}d$r x ON x.src = e.a
           |  JOIN t${k}d$r y ON y.src = e.b AND y.dst = x.dst
           |  GROUP BY e.a, e.b
           |), t${k}e$r AS MATERIALIZED (
           |  SELECT e.a, e.b FROM $p e
           |  JOIN t${k}s$r s ON s.a = e.a AND s.b = e.b AND s.sup >= ${k - 2}
           |)""".stripMargin
      }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |),
       |${level(3, "e0")},
       |${level(4, "t3e2")},
       |m AS (
       |  SELECT a, b, 2 AS lvl FROM e0
       |  UNION ALL SELECT a, b, 3 FROM t3e2
       |  UNION ALL SELECT a, b, 4 FROM t4e2
       |)
       |SELECT a, b, CAST(MAX(lvl) AS BIGINT) AS trussness
       |FROM m GROUP BY a, b ORDER BY a, b""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "graph_coreness" -> corenessSql,
    "graph_trussness" -> trussnessSql,
    "dedup_substring" ->
      """WITH tok AS (
        |  SELECT doc_id, str_split(text, ' ') AS tk FROM documents
        |), win AS (
        |  SELECT doc_id, i AS pos,
        |    array_to_string(list_slice(tk, i, i + 7), ' ') AS w
        |  FROM tok, (SELECT unnest(range(1, 200)) AS i) r
        |  WHERE i + 7 <= len(tk)
        |), winu AS (
        |  SELECT doc_id, w, MIN(pos) AS pos FROM win GROUP BY doc_id, w
        |), rare AS (SELECT w FROM winu GROUP BY w HAVING COUNT(*) <= 50),
        |wf AS (SELECT winu.* FROM winu JOIN rare USING (w)),
        |pairs AS MATERIALIZED (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
        |  FROM wf a JOIN wf b ON a.w = b.w AND a.doc_id < b.doc_id
        |), runs AS (
        |  SELECT doc_a, doc_b,
        |    pa - row_number() OVER (PARTITION BY doc_a, doc_b ORDER BY pa) AS ga,
        |    pb - row_number() OVER (PARTITION BY doc_a, doc_b ORDER BY pa) AS gb
        |  FROM pairs
        |), isl AS (
        |  SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS run
        |  FROM runs GROUP BY doc_a, doc_b, ga, gb
        |), longest AS (
        |  SELECT doc_a, doc_b, CAST(MAX(run) + 7 AS BIGINT) AS longest_tokens
        |  FROM isl GROUP BY doc_a, doc_b
        |), counts AS (
        |  SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM pairs GROUP BY doc_a, doc_b HAVING COUNT(*) >= 2
        |)
        |SELECT c.doc_a, c.doc_b, c.n_shared, l.longest_tokens
        |FROM counts c JOIN longest l USING (doc_a, doc_b)
        |ORDER BY c.doc_a, c.doc_b""".stripMargin,
    "cdc_conflicts" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_id
        |  FROM events
        |), b AS (
        |  SELECT user_id, ts_sec // 3600 AS bucket,
        |    SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
        |    SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b,
        |    MAX(ts_sec * 100000000 + event_id) AS mo
        |  FROM e GROUP BY 1, 2
        |)
        |SELECT user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |  CAST(SUM(CASE WHEN n_a > 0 AND n_b > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_conflicts,
        |  CAST(SUM(CASE WHEN n_a > 0 AND n_b > 0 AND mo % 2 = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_wins_a,
        |  CAST(SUM(CASE WHEN n_a > 0 AND n_b > 0 AND mo % 2 = 1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_wins_b,
        |  CAST(MAX(CASE WHEN n_a > 0 AND n_b > 0 THEN bucket END) AS BIGINT)
        |    AS last_conflict_bucket
        |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_class_balance" -> QueriesR7.sql("q_class_balance"),
    "stream_backfill_gaps" -> QueriesR7.sql("cdc_backfill_plan"),
    "graph_percolation" ->
      s"""WITH RECURSIVE ${QueriesData.minhashCtes},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
         |), tri AS MATERIALIZED (
         |  SELECT x.id_a AS a, x.id_b AS b, y.id_b AS c,
         |    x.id_a * 1099511627776 + x.id_b * 1048576 + y.id_b AS tid
         |  FROM cand x
         |  JOIN cand y ON y.id_a = x.id_b
         |  JOIN cand z ON z.id_a = x.id_a AND z.id_b = y.id_b
         |), tedge AS MATERIALIZED (
         |  SELECT tid, a AS u, b AS v FROM tri
         |  UNION ALL SELECT tid, b, c FROM tri
         |  UNION ALL SELECT tid, a, c FROM tri
         |), adj AS (
         |  SELECT p.tid AS s, q.tid AS d FROM tedge p JOIN tedge q
         |  ON p.u = q.u AND p.v = q.v AND p.tid < q.tid
         |), sym AS (
         |  SELECT s, d FROM adj UNION SELECT d, s FROM adj
         |), reach(id, lbl) AS (
         |  SELECT tid, tid FROM tri
         |  UNION
         |  SELECT s.s, r.lbl FROM reach r JOIN sym s ON s.d = r.id
         |), comm AS (
         |  SELECT id AS tid, MIN(lbl) AS community FROM reach GROUP BY id
         |)
         |SELECT DISTINCT n.node, CAST(c.community AS BIGINT) AS community
         |FROM (SELECT tid, a AS node FROM tri
         |      UNION ALL SELECT tid, b FROM tri
         |      UNION ALL SELECT tid, c FROM tri) n
         |JOIN comm c ON c.tid = n.tid
         |ORDER BY node, community""".stripMargin,
    "text_heaps" ->
      """WITH toks AS (
        |  SELECT doc_id, str_split(text, ' ') AS tk FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(tk) AS tok,
        |    unnest(range(1, len(tk) + 1)) AS pos
        |  FROM toks
        |), marked AS (
        |  SELECT doc_id,
        |    CASE WHEN row_number() OVER (PARTITION BY tok
        |      ORDER BY doc_id, pos) = 1 THEN 1 ELSE 0 END AS is_new
        |  FROM tok
        |), per_doc AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
        |    CAST(SUM(is_new) AS BIGINT) AS n_new
        |  FROM marked GROUP BY doc_id
        |)
        |SELECT doc_id,
        |  CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum_tokens,
        |  CAST(SUM(n_new) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum_vocab
        |FROM per_doc ORDER BY doc_id""".stripMargin,
    "q_item_similarity" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
        |), f AS (
        |  SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM li GROUP BY item
        |), p AS (
        |  SELECT a.item AS ia, b.item AS ib, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM li a JOIN li b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |), j AS (
        |  SELECT ia, ib, inter,
        |    CAST(fa.n + fb.n - inter AS BIGINT) AS uni,
        |    CAST(inter * 1000000 // (fa.n + fb.n - inter) AS BIGINT) AS jac
        |  FROM p JOIN f fa ON fa.item = p.ia JOIN f fb ON fb.item = p.ib
        |), s AS (
        |  SELECT ia AS item, ib AS co_item, inter, uni, jac FROM j
        |  UNION ALL SELECT ib, ia, inter, uni, jac FROM j
        |), r AS (
        |  SELECT item, co_item, inter AS n_inter, uni AS n_union,
        |    jac AS jaccard_ppm,
        |    CAST(row_number() OVER (PARTITION BY item
        |      ORDER BY jac DESC, co_item) AS BIGINT) AS rnk
        |  FROM s
        |)
        |SELECT item, co_item, n_inter, n_union, jaccard_ppm, rnk
        |FROM r WHERE rnk <= 3 ORDER BY item, rnk""".stripMargin,
    "zorder_incremental" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE user_id BETWEEN 2 AND 9 AND event_id BETWEEN 100 AND 700
        |ORDER BY event_id""".stripMargin,
    "stream_k_anonymity" -> QueriesR7.sql("dq_k_anonymity"))
}
