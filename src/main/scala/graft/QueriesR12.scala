package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-5 surface growth: multi-objective frontier queries, the
  * experimentation/statistics kit (chi-square, Gini split scoring,
  * concentration), ranked-list eval (gains/lift), and fixed-point
  * sequential smoothing — all under the exact integer contracts that
  * make the DuckDB hash gate meaningful.
  *
  * Reference anchor: README's "real-time data warehouse" use case — the
  * analyst surface of the replicated schema. Each gate is a query an
  * Oracle-replica analyst would run against the warehouse.
  */
object QueriesR12 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Money columns in integer cents: exact in both engines. */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(12,2)") * 100).cast("long")

  /** R115: 2-D Pareto skyline (see [[graft.operators.Skyline.skyline2d]])
    * — the best-trade-off customers on (order count, average order value):
    * nobody else is at least as frequent AND at least as big-ticket with
    * one strict improvement. avg_cents uses truncating `div` so the
    * derived dimension is integer-exact in both engines. The anti-
    * correlated pair keeps the frontier non-trivial at every SF (a
    * correlated pair would collapse it to a point).
    */
  def qSkyline(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("total_cents"))
      .withColumn("avg_cents", expr("total_cents div n_orders"))
      .select(col("o_custkey"), col("n_orders"), col("avg_cents"))
    graft.operators.Skyline.skyline2d(perCust, col("n_orders"),
        col("avg_cents"), buckets = 1024)
      .orderBy(col("o_custkey"))
  }

  /** R115b: 2×2 chi-square independence per line status (see
    * [[graft.operators.Eval.chiSquare2x2]]) — does a deep discount
    * (≥ 6%) move the return rate? Discount thresholded on exact integer
    * percent (round(d·100)) so both engines bucket identically.
    */
  def qChi2Test(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.chiSquare2x2(t(s, dir, "lineitem"),
        col("l_linestatus"),
        col("l_returnflag") === "R",
        round(col("l_discount") * 100).cast("long") >= 6)
      .orderBy(col("grp"))

  /** R115c: Gini split scoring (see [[graft.operators.Eval.giniSplit]])
    * — how well does order priority separate order status?
    */
  def qGiniSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.giniSplit(t(s, dir, "orders"),
        col("o_orderpriority"), col("o_orderstatus"))
      .orderBy(col("feature_value"))

  /** R115d: decile gains/lift table (see
    * [[graft.operators.Eval.gainsTable]]) — order value as a
    * "fulfillment risk" score: which spend decile captures what share of
    * F-status orders. o_orderkey is UNIQUE (verified against the data;
    * lineitem's (orderkey, linenumber) is NOT in this corpus), which is
    * what makes the (score desc, id) order total and the tile split
    * engine-identical.
    */
  def qEvalGains(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.gainsTable(t(s, dir, "orders"),
        col("o_orderstatus") === "F",
        cents(col("o_totalprice")),
        col("o_orderkey"),
        tiles = 10)
      .orderBy(col("tile"))

  /** R116: EWMA smoothing in exact fixed point (see
    * [[graft.operators.Changepoint.ewma]]) — per-user spend trend over
    * the event stream, α = 0.2, milli-cent units; the oracle replays the
    * same truncating recursion as a recursive CTE.
    */
  def qEwmaSmooth(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
      round(col("value") * 100).cast("long").as("cents"))
    graft.operators.Changepoint.ewma(e, col("user_id"), col("event_id"),
        col("ts_sec"), col("cents"), alphaPpm = 200000L)
      .select(col("key").as("user_id"), col("id").as("event_id"),
        col("ts_sec"), col("x"), col("ewma_milli"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** R117: Herfindahl–Hirschman concentration index — per nation, how
    * concentrated is supplier revenue? HHI is exactly rational
    * (Σ shareᵢ² = Σ revᵢ² / (Σ rev)²), so one cross-multiplied floor
    * division lands the same integer in both engines:
    *
    *   hhi_ppm = (Σ revᵢ²)·10⁶ div (Σ rev)²
    *
    * (10⁶ = perfectly monopolized, 10⁶/n = perfectly even). DECIMAL(38,0)
    * for the squared-cents sums — rev² passes int64 at ~10⁹ cents. The
    * supply-base risk screen; one join + two hash aggregates.
    */
  def qConcentrationHhi(s: SparkSession, dir: String): DataFrame = {
    val perSupp = t(s, dir, "lineitem")
      .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("rev"))
    perSupp.groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rev")).as("total_cents"),
        sum(expr("CAST(rev AS DECIMAL(19,0)) * rev")).as("__sq"))
      .select(col("s_nationkey"), col("n_suppliers"), col("total_cents"),
        expr("""__sq * 1000000
               | div (CAST(total_cents AS DECIMAL(38,0)) * total_cents)"""
          .stripMargin).as("hhi_ppm"))
      .orderBy(col("s_nationkey"))
  }

  /** X29: streaming EWMA (see
    * [[graft.streaming.Streams.streamingEwma]]) — R116's recursion with
    * per-key state carried across micro-batches; same input, same
    * recursive-CTE oracle as `q_ewma_smooth`, so streaming ≡ batch is
    * gate-checked bit-for-bit.
    */
  def streamEwma(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id").as("key"),
      col("event_id").as("id"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
      round(col("value") * 100).cast("long").as("x"))
    graft.streaming.Streams.streamingEwma(s, e, alphaPpm = 200000L,
        queryName = s"gate_sewma_${System.nanoTime()}")
      .select(col("key").as("user_id"), col("id").as("event_id"),
        col("ts_sec"), col("x"), col("ewma_milli"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** S14: label-aware retrieval eval — MRR and precision@5 of the gated
    * IVF index against same-label ground truth (the standard labeled-
    * corpus ANN benchmark): per query, relevant = same-label candidates
    * (self-hits excluded — a query trivially retrieves itself), MRR =
    * 10⁶ div rank of the first relevant hit (null when none), P@5 =
    * relevant in the returned list div 5. Complements S13 (recall vs
    * the exact index says "does IVF approximate brute force"; this says
    * "does the index retrieve the right CLASS"). All integer ppm; both
    * sides reuse the gated S2 path and its oracle verbatim.
    */
  def qEvalMrr(s: SparkSession, dir: String): DataFrame = {
    val lab = t(s, dir, "embeddings").select(col("vec_id"), col("label"))
    val ivf = QueriesData.annIvfTopk(s, dir)
    ivf
      .join(lab.select(col("vec_id"), col("label").as("cand_label")),
        col("cand_id") === col("vec_id")).drop("vec_id")
      .join(lab.select(col("vec_id"), col("label").as("query_label")),
        col("query_id") === col("vec_id")).drop("vec_id")
      .withColumn("rel",
        col("cand_label") === col("query_label") &&
          col("cand_id") =!= col("query_id"))
      .groupBy(col("query_id"))
      .agg(sum(when(col("rel"), 1L).otherwise(0L)).as("n_rel"),
        min(when(col("rel"), col("rnk"))).as("first_rel_rank"))
      .select(col("query_id"), col("n_rel"), col("first_rel_rank"),
        when(col("first_rel_rank").isNull, lit(null))
          .otherwise(expr("1000000 div first_rel_rank")).as("mrr_ppm"),
        expr("n_rel * 1000000 div 5").as("p_at_5_ppm"))
      .orderBy(col("query_id"))
  }

  /** R118: rank (quantile) normalization — each value mapped to its
    * exact rank as ppm of its group size, (rank·10⁶) div n: the
    * distribution-free feature scaling that survives outliers where
    * min-max scaling collapses (one extreme value crushes every other
    * feature to ~0; ranks are unmoved). Built on the two-stage exact
    * rank (R48's machinery — per-(group, bucket) row_number + bucket
    * offsets from a metadata-sized window), so there is no data-sized
    * single-partition sort anywhere; ties break on the row id, a total
    * order both engines share.
    */
  def qRankNormalize(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderpriority"),
      col("o_orderkey").as("id"), cents(col("o_totalprice")).as("scr"))
    graft.operators.Ranking.rankExact(o, Seq("o_orderpriority"), col("scr"),
        Seq(col("id")), "rnk")
      .withColumn("rank_ppm", expr("rnk * 1000000 div __total"))
      .select(col("o_orderpriority"), col("id"), col("scr"), col("rnk"),
        col("rank_ppm"))
      .orderBy(col("o_orderpriority"), col("id"))
  }

  /** T27: per-document n-gram novelty — the marginal-utility screen of a
    * training corpus: for each doc, the share of its DISTINCT word
    * trigrams whose first owner (min doc_id across the corpus) is the
    * doc itself. Documents full of grams seen in earlier docs score low
    * — the soft counterpart of D14's exact substring dedup, useful for
    * ORDERING ingestion rather than dropping (dedup decides "is it a
    * copy", novelty prices "what does it add"). One explode + one gram
    * aggregate + one join back, all hash-partitioned on the gram — no
    * all-pairs anything; at 100 TB the gram table shards like any
    * inverted index. Sub-trigram docs have no grams and no row (nothing
    * to price). novelty_ppm = n_novel·10⁶ div n_grams, exact.
    */
  def textNovelty(s: SparkSession, dir: String): DataFrame = {
    val grams = t(s, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.TextFunctions.wordShingles(col("text"), 3))).as("g"))
    val owner = grams.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
    grams.join(owner, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("n_novel * 1000000 div n_grams").as("novelty_ppm"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- oracle

  private val sqlBase: Map[String, String] = Map(
    "text_novelty" ->
      """WITH g0 AS (
        |  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i
        |        FROM (SELECT doc_id, str_split(text, ' ') AS ts
        |              FROM documents) d) t
        |), grams AS (SELECT DISTINCT doc_id, g FROM g0),
        |own AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY 1)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS novelty_ppm
        |FROM grams JOIN own USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_rank_normalize" ->
      """WITH e AS (
        |  SELECT o_orderpriority, o_orderkey AS id,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS scr
        |  FROM orders
        |)
        |SELECT o_orderpriority, id, scr,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |    ORDER BY scr, id) AS BIGINT) AS rnk,
        |  CAST(CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |    ORDER BY scr, id) AS BIGINT) * 1000000
        |    // COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
        |    AS rank_ppm
        |FROM e ORDER BY o_orderpriority, id""".stripMargin,
    "q_eval_mrr" ->
      s"""WITH ivf AS (
         |  SELECT * FROM (
         |${QueriesData.sql("ann_ivf_topk")}
         |  ) t
         |), lab AS (
         |  SELECT vec_id, label FROM embeddings
         |), j AS (
         |  SELECT i.query_id, i.rnk,
         |    (cl.label = ql.label AND i.cand_id <> i.query_id) AS rel
         |  FROM ivf i
         |  JOIN lab cl ON i.cand_id = cl.vec_id
         |  JOIN lab ql ON i.query_id = ql.vec_id
         |), a AS (
         |  SELECT query_id,
         |    CAST(SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
         |    MIN(CASE WHEN rel THEN rnk END) AS fr
         |  FROM j GROUP BY 1
         |)
         |SELECT query_id, n_rel, CAST(fr AS BIGINT) AS first_rel_rank,
         |  CASE WHEN fr IS NULL THEN NULL
         |    ELSE CAST(1000000 // fr AS BIGINT) END AS mrr_ppm,
         |  CAST(n_rel * 1000000 // 5 AS BIGINT) AS p_at_5_ppm
         |FROM a ORDER BY query_id""".stripMargin,
    "q_chi2_test" ->
      """WITH e AS (
        |  SELECT l_linestatus AS grp,
        |    (l_returnflag = 'R') AS pa,
        |    (CAST(ROUND(l_discount * 100) AS BIGINT) >= 6) AS pb
        |  FROM lineitem
        |), g AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN pa AND pb THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN NOT pa AND NOT pb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d
        |  FROM e GROUP BY 1
        |)
        |SELECT grp, n, a, b, c, d,
        |  CASE WHEN (a+b)*(c+d) = 0 OR (a+c)*(b+d) = 0 THEN NULL
        |  ELSE CAST(CAST(n AS HUGEINT) * (a*d - b*c) * (a*d - b*c) * 1000000
        |    // (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d))
        |    AS BIGINT) END AS chi2_ppm
        |FROM g ORDER BY grp""".stripMargin,
    "q_gini_split" ->
      """WITH cells AS (
        |  SELECT CAST(o_orderpriority AS VARCHAR) AS feature_value,
        |    CAST(o_orderstatus AS VARCHAR) AS lbl,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2
        |), pv AS (
        |  SELECT feature_value, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS n_classes,
        |    CAST(SUM(c * c) AS BIGINT) AS sq
        |  FROM cells GROUP BY 1
        |), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM pv)
        |SELECT feature_value, n, n_classes,
        |  CAST((n * n - sq) * 1000000 // (n * n) AS BIGINT) AS gini_ppm,
        |  CAST(n * 1000000 // n_total AS BIGINT) AS weight_ppm
        |FROM pv, tot ORDER BY feature_value""".stripMargin,
    "q_eval_gains" ->
      """WITH e AS (
        |  SELECT (o_orderstatus = 'F') AS lbl,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS scr,
        |    o_orderkey AS id
        |  FROM orders
        |), tiled AS (
        |  SELECT lbl, CAST(NTILE(10) OVER (ORDER BY scr DESC, id) AS BIGINT)
        |    AS tile
        |  FROM e
        |), pt AS (
        |  SELECT tile, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN lbl THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |  FROM tiled GROUP BY 1
        |), cum AS (
        |  SELECT tile, n, n_pos,
        |    CAST(SUM(n) OVER (ORDER BY tile) AS BIGINT) AS cum_n,
        |    CAST(SUM(n_pos) OVER (ORDER BY tile) AS BIGINT) AS cum_pos,
        |    CAST(SUM(n_pos) OVER () AS BIGINT) AS tp,
        |    CAST(SUM(n) OVER () AS BIGINT) AS nt
        |  FROM pt
        |)
        |SELECT tile, n, n_pos, cum_n, cum_pos,
        |  CASE WHEN tp = 0 THEN NULL
        |    ELSE CAST(cum_pos * 1000000 // tp AS BIGINT) END AS capture_ppm,
        |  CASE WHEN tp = 0 THEN NULL
        |    ELSE CAST(CAST(cum_pos AS HUGEINT) * nt * 1000000
        |      // (CAST(cum_n AS HUGEINT) * tp) AS BIGINT) END AS lift_ppm
        |FROM cum ORDER BY tile""".stripMargin,
    "q_ewma_smooth" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |    CAST(ROUND(value * 100) AS BIGINT) AS x
        |  FROM events
        |), r AS (
        |  SELECT user_id, event_id, ts_sec, x,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts_sec, event_id) AS rn
        |  FROM e
        |), rec AS (
        |  SELECT user_id, event_id, ts_sec, x, rn, x * 1000 AS m
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.event_id, r.ts_sec, r.x, r.rn,
        |    (200000 * r.x * 1000 + 800000 * rec.m) // 1000000 AS m
        |  FROM r JOIN rec ON r.user_id = rec.user_id AND r.rn = rec.rn + 1
        |)
        |SELECT user_id, event_id, ts_sec, x, CAST(m AS BIGINT) AS ewma_milli
        |FROM rec ORDER BY user_id, event_id""".stripMargin,
    "q_concentration_hhi" ->
      """WITH ps AS (
        |  SELECT s_nationkey, l_suppkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2
        |)
        |SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |  CAST(SUM(rev) AS BIGINT) AS total_cents,
        |  CAST(SUM(CAST(rev AS HUGEINT) * rev) * 1000000
        |    // (CAST(SUM(rev) AS HUGEINT) * SUM(rev)) AS BIGINT) AS hhi_ppm
        |FROM ps GROUP BY 1 ORDER BY s_nationkey""".stripMargin,
    "q_skyline" ->
      """WITH s AS (
        |  SELECT o_custkey,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS BIGINT) // COUNT(*) AS avg_cents
        |  FROM orders GROUP BY 1
        |)
        |SELECT p.o_custkey, p.n_orders, CAST(p.avg_cents AS BIGINT) AS avg_cents
        |FROM s p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM s q
        |  WHERE q.n_orders >= p.n_orders AND q.avg_cents >= p.avg_cents
        |    AND (q.n_orders > p.n_orders OR q.avg_cents > p.avg_cents))
        |ORDER BY p.o_custkey""".stripMargin)

  // X29 shares R116's recursive-CTE oracle verbatim: streaming ≡ batch
  val sql: Map[String, String] =
    sqlBase + ("stream_ewma" -> sqlBase("q_ewma_smooth"))
}
