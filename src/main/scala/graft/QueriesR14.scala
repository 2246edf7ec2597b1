package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-6 surface growth, batch i+: graded ranking eval (R137 NDCG@k),
  * grid-based Kendall rank correlation (R138), and the operators that
  * follow in this session. House contract throughout: integer/ppm fixed
  * point, sign-carried magnitude division (floor ≡ trunc on nonneg
  * operands), total orders completed by an id column — DuckDB oracle
  * hashes land bit-identical.
  *
  * Reference anchor: README's "real-time data warehouse" use case — each
  * gate is a question an analyst asks of the replicated schema (how good
  * is the retrieval ordering, does ship timing co-move with line size,
  * which parts broker the co-purchase hubs).
  */
object QueriesR14 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Money columns in integer cents: exact in both engines. */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(12,2)") * 100).cast("long")

  /** R137: NDCG@5 of the gated IVF retrieval against graded same-label
    * ground truth — rel 2 = same label, 1 = adjacent label (classes are
    * ordinal 0–9), 0 otherwise; self-hits rel 0. Complements S14: MRR
    * asks "where is the first relevant hit", NDCG scores the WHOLE
    * graded ordering under the fixed ⌊10⁶/log₂(i+1)⌋ discount table
    * that the oracle inlines verbatim (both engines share the literal;
    * no irrational ever enters a plan).
    */
  def qEvalNdcg(s: SparkSession, dir: String): DataFrame = {
    val lab = t(s, dir, "embeddings").select(col("vec_id"), col("label"))
    val graded = QueriesData.annIvfTopk(s, dir)
      .join(lab.select(col("vec_id"), col("label").as("cl")),
        col("cand_id") === col("vec_id")).drop("vec_id")
      .join(lab.select(col("vec_id"), col("label").as("ql")),
        col("query_id") === col("vec_id")).drop("vec_id")
      .withColumn("rel",
        when(col("cand_id") === col("query_id"), 0L)
          .when(col("cl") === col("ql"), 2L)
          .when(abs(col("cl") - col("ql")) === 1, 1L)
          .otherwise(0L))
    graft.operators.Eval.ndcgAtK(graded, col("query_id"), col("rel"),
        col("rnk"), k = 5)
      .orderBy(col("query_id"))
  }

  /** R138: Kendall tau from the quantity × ship-month grid per return
    * flag — does later-in-year shipping co-move with bigger lines? The
    * 50×12 grid makes the pair counting domain-sized (see
    * [[graft.operators.RankStats.kendallTau]]); ties are massive by
    * construction (60k rows on 600 cells), exactly the regime tau-b's
    * tie correction exists for.
    */
  def qKendall(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.kendallTau(t(s, dir, "lineitem"),
        "l_returnflag", col("l_quantity").cast("long"),
        month(col("l_shipdate").cast("date")).cast("long"))
      .orderBy(col("grp"))

  /** R139: HITS over the directed customer→supplier purchase graph
    * (supplier ids offset by 10⁶ so the two key spaces share one node
    * universe without colliding) — hub = a broad buyer, authority = a
    * widely-bought-from seller; 2 authority-first rounds, chained-CTE
    * oracle with scalar-subquery normalization (the R134 idiom, two
    * tables per round instead of one).
    */
  def graphHits(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "orders")
      .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 1000000L).as("dst"))
    graft.operators.Graph.hits(edges, iterations = 2)
      .orderBy(col("node"))
  }

  /** R140: link prediction on the co-purchase graph — non-adjacent part
    * pairs sharing ≥2 co-purchase neighbors of degree ≤ 96 (the hub
    * cap that keeps wedge fanout linear in edges), scored by
    * neighborhood Jaccard; "which parts SHOULD co-sell but don't yet",
    * top 500 under a total order.
    */
  def graphLinkPredict(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.linkPredictJaccard(
        QueriesR6.coPurchaseEdges(s, dir),
        minCommon = 2L, maxCenterDegree = 96L)
      .orderBy(col("jaccard_ppm").desc, col("u"), col("v"))
      .limit(500)

  /** R141: Welch t² per line status — do returned lines (R) ship in
    * different QUANTITIES than kept ones, by means this time? The
    * parametric mirror of R120's rank test on the same split, so the
    * two gates answer the same question under different assumptions —
    * the textbook robustness pairing.
    */
  def qWelchT2(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.welchT2(t(s, dir, "lineitem"),
        col("l_linestatus"), col("l_returnflag") === "R",
        col("l_quantity").cast("long"))
      .orderBy(col("grp"))

  /** R142: seasonal Holt over the monthly order-count series per
    * priority class (first digit keys the series) — 12-position frozen
    * seasonal indices + the R130 recursion on the deseasonalized
    * counts; the oracle replays indices as one aggregate CTE and the
    * walk as the recursive-CTE idiom with the seasonal join added.
    */
  def qHoltWinters(s: SparkSession, dir: String): DataFrame = {
    val mo = t(s, dir, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("k"),
        (year(col("o_orderdate").cast("date")) * 100 +
          month(col("o_orderdate").cast("date"))).cast("long").as("ym"))
      .groupBy(col("k"), col("ym"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Changepoint.holtSeasonal(mo, col("k"), col("ym"),
        col("ym"), col("x"), period = 12, alphaPpm = 200000L,
        betaPpm = 100000L)
      .orderBy(col("key"), col("id"))
  }

  /** R143: forecast-error report — MASE of the R142 seasonal-Holt
    * forecasts on the monthly order-count series, against the naive and
    * seasonal-naive baselines; the evaluation loop the forecasting kit
    * was missing (R130/R142 produce forecasts, this grades them).
    */
  def qForecastError(s: SparkSession, dir: String): DataFrame =
    graft.operators.Changepoint.forecastError(qHoltWinters(s, dir),
        col("key"), col("id"), col("x"), col("forecast_milli"), period = 12)
      .orderBy(col("key"))

  /** R144: seasonal-strength report — how much monthly-order-count
    * variance the 12-position seasonal indices explain, per priority
    * class; the "is R142 even the right model here" screen.
    */
  def qSeasonalStrength(s: SparkSession, dir: String): DataFrame = {
    val mo = t(s, dir, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("k"),
        (year(col("o_orderdate").cast("date")) * 100 +
          month(col("o_orderdate").cast("date"))).cast("long").as("ym"))
      .groupBy(col("k"), col("ym"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Changepoint.seasonalStrength(mo, col("k"), col("ym"),
        col("ym"), col("x"), period = 12)
      .orderBy(col("key"))
  }

  /** T28: source vocabulary-overlap matrix (see
    * [[graft.operators.Retrieval.vocabOverlap]]) over the documents
    * corpus — the mixture diagnostic one level above D10's
    * document-level leakage matrix.
    */
  def textVocabOverlap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Retrieval.vocabOverlap(t(s, dir, "documents"),
        col("source"), col("text"))
      .orderBy(col("src_a"), col("src_b"))

  /** R145: classical MA decomposition (see
    * [[graft.operators.Changepoint.decomposeMA]]) of the monthly
    * order-count series per priority class — trend via the centered
    * 12-window MA, seasonal from per-phase detrended means, remainder
    * closing the additive identity bit-exactly.
    */
  def qDecomposeMa(s: SparkSession, dir: String): DataFrame = {
    val mo = t(s, dir, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("k"),
        (year(col("o_orderdate").cast("date")) * 100 +
          month(col("o_orderdate").cast("date"))).cast("long").as("ym"))
      .groupBy(col("k"), col("ym"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Changepoint.decomposeMA(mo, col("k"), col("ym"),
        col("ym"), col("x"), period = 12)
      .orderBy(col("key"), col("id"))
  }

  /** R146+R147: distribution-free trend kit (see
    * [[graft.operators.Changepoint.trendTest]]) — Theil–Sen slope and
    * the Mann–Kendall z² over the monthly order-count series per
    * priority class, on a UNIFORM month-index clock so slopes are
    * per-month units.
    */
  def qTrendTest(s: SparkSession, dir: String): DataFrame = {
    val mo = t(s, dir, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("k"),
        ((year(col("o_orderdate").cast("date")) - 1992) * 12 +
          month(col("o_orderdate").cast("date"))).cast("long").as("t"))
      .groupBy(col("k"), col("t"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Changepoint.trendTest(mo, col("k"), col("t"), col("t"),
        col("x"))
      .orderBy(col("key"))
  }

  /** R148+R149: randomness screens (see
    * [[graft.operators.Changepoint.randomnessTest]]) — runs test on the
    * differenced monthly order-count series + turning-points test, per
    * priority class on the uniform month-index clock.
    */
  def qRunsTest(s: SparkSession, dir: String): DataFrame = {
    val mo = t(s, dir, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("k"),
        ((year(col("o_orderdate").cast("date")) - 1992) * 12 +
          month(col("o_orderdate").cast("date"))).cast("long").as("t"))
      .groupBy(col("k"), col("t"))
      .agg(count(lit(1)).as("x"))
    graft.operators.Changepoint.randomnessTest(mo, col("k"), col("t"),
        col("t"), col("x"))
      .orderBy(col("key"))
  }

  /** R150+R151: score-quality report (see
    * [[graft.operators.Eval.scoreQuality]]) — Brier + ECE of a
    * deterministic pseudo-model (quantity/discount-driven ppm score)
    * predicting line returns, per line status, 10 ECE bins. Completes
    * the probabilistic-eval shelf beside R108 AUC and R109 calibration.
    */
  def qScoreQuality(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.scoreQuality(t(s, dir, "lineitem"),
        col("l_linestatus"), col("l_returnflag") === "R",
        col("l_quantity").cast("long") * 19000 +
          round(col("l_discount") * 100).cast("long") * 4000,
        bins = 10)
      .orderBy(col("grp"))

  /** X35: streaming score-quality monitor (see
    * [[graft.streaming.Streams.streamingScoreQuality]]) — same input,
    * same oracle as `q_score_quality`.
    */
  def streamScoreQuality(s: SparkSession, dir: String): DataFrame = {
    val rows = t(s, dir, "lineitem")
      .select(col("l_linestatus").as("grp"),
        (col("l_returnflag") === "R").as("y"),
        (col("l_quantity").cast("long") * 19000 +
          round(col("l_discount") * 100).cast("long") * 4000).as("p"))
    graft.streaming.Streams.streamingScoreQuality(s, rows, bins = 10,
        queryName = s"gate_squality_${System.nanoTime()}")
      .orderBy(col("grp"))
  }

  /** R152: Reciprocal Rank Fusion (see
    * [[graft.operators.Ranking.rrfFuse]]) of the two gated retrieval
    * lists — exact brute-force cosine (S1) and the IVF index (S2) —
    * canonical k = 60, fused top 5 per query: the retrieval ensemble
    * the eval shelf (S13/S14/R137) measures.
    */
  def qRrfFusion(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.rrfFuse(
        Seq(QueriesData.annBruteforceTopk(s, dir),
          QueriesData.annIvfTopk(s, dir)), k = 60L, topN = 5)
      .orderBy(col("query_id"), col("rnk"))

  /** T29: Good–Turing smoothing (see
    * [[graft.operators.Retrieval.goodTuring]]) over the word-trigram
    * shingle frequencies of the documents corpus — T27's novelty unit
    * gives a real sparse frequency spectrum where raw words (31-token
    * vocabulary) would not.
    */
  def textGoodTuring(s: SparkSession, dir: String): DataFrame =
    graft.operators.Retrieval.goodTuring(t(s, dir, "documents"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3))
      .orderBy(col("r"))

  /** T30: Zipf constancy report (see
    * [[graft.operators.Retrieval.zipfReport]]) — rank·freq products
    * for the top 100 shingles, ranks from the two-stage exact rank.
    */
  def textZipf(s: SparkSession, dir: String): DataFrame =
    graft.operators.Retrieval.zipfReport(t(s, dir, "documents"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3),
        topN = 100)
      .orderBy(col("rank"))

  /** R153: exact weighted bottom-k sample (see
    * [[graft.operators.Sampling.weightedBottomK]]) — 200 events drawn
    * without replacement with odds ∝ a clamped value weight, integer
    * priorities the oracle replays bit-for-bit (the A-ES float path
    * R53b stays spec-verified; this is its gate-able sibling).
    */
  def qWeightedBottomK(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        greatest(lit(1L),
          least(round(col("value") * 100).cast("long"), lit(10000L)))
          .as("w"))
    graft.operators.Sampling.weightedBottomK(e, "event_id", col("w"),
        k = 200)
      .orderBy(col("priority"), col("event_id"))
  }

  /** C35: net-change squash (see [[graft.cdc.Cdc.netChanges]]) — a
    * synthetic I/U/D change stream (orderkey mod folds ~hundred ops
    * onto each key, op from the key's residue class, payload = price
    * cents) collapsed to net effects: the "don't replay the whole
    * intra-batch history" step between delta extraction (C3) and MERGE
    * (C5).
    */
  private def netChangeRows(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select((col("o_orderkey") % 1000).as("key"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 7 === 6, "D")
          .when(col("o_orderkey") % 7 >= 3, "U")
          .otherwise("I").as("op"),
        cents(col("o_totalprice")).as("payload"))

  def cdcNetChanges(s: SparkSession, dir: String): DataFrame =
    graft.cdc.Cdc.netChanges(netChangeRows(s, dir), col("key"), col("seq"),
        col("op"), col("payload"))
      .orderBy(col("key"))

  /** X36: streaming net-change squash (see
    * [[graft.streaming.Streams.streamingNetChanges]]) — same input,
    * same oracle as `cdc_net_changes`; the state is order-independent
    * so no delivery-order contract is needed.
    */
  def streamNetChanges(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.streamingNetChanges(s, netChangeRows(s, dir),
        queryName = s"gate_snetchg_${System.nanoTime()}")
      .orderBy(col("key"))

  /** R154: deterministic bootstrap CI (see
    * [[graft.operators.Sampling.bootstrapMeanCI]]) — a 95% CI for mean
    * order value per priority class from 40 hash-driven resamples; the
    * assumption-free uncertainty quantifier beside R141's parametric
    * t².
    */
  def qBootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderpriority"), cents(col("o_totalprice")).as("v"),
        col("o_orderkey").as("id"))
    graft.operators.Sampling.bootstrapMeanCI(o, "o_orderpriority",
        col("v"), col("id"), b = 40, loPpm = 25000L, hiPpm = 975000L)
      .orderBy(col("grp"))
  }

  /** R155: deterministic permutation test (see
    * [[graft.operators.RankStats.permutationTest]]) — do even- and
    * odd-keyed customers spend differently per priority class? A null
    * effect by construction, so the gate also checks the test's
    * CALIBRATION (p should land high); 40 hash-drawn label shuffles.
    */
  def qPermutationTest(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderpriority"), (col("o_custkey") % 2 === 0).as("s"),
        cents(col("o_totalprice")).as("v"), col("o_orderkey").as("id"))
    graft.operators.RankStats.permutationTest(o, "o_orderpriority",
        col("s"), col("v"), col("id"), b = 40)
      .orderBy(col("grp"))
  }

  /** M7: MP3 frame-header decode (see
    * [[graft.multimodal.Mp3Header]]) — synthesized MPEG-1 Layer III
    * frames (bitrate/samplerate/mode indices from the doc id), a third
    * of them behind an ID3v2 tag the decoder must skip by its syncsafe
    * size; the oracle recomputes the expected fields from the id alone.
    */
  def mmMp3Meta(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
    val brIdx = (col("doc_id") % 14 + 1).cast("int")
    val srIdx = (col("doc_id") % 3).cast("int")
    val mode = (col("doc_id") % 4).cast("int")
    val frame = concat(lit("fffb"),
      lpad(hex(brIdx * 16 + srIdx * 4), 2, "0"),
      lpad(hex(mode * 64), 2, "0"))
    val id3 = lit("4944330400000000000d" + "00" * 13)
    val payload = unhex(
      when(col("doc_id") % 3 === 0, concat(id3, frame)).otherwise(frame))
    d.withColumn("meta", graft.multimodal.Mp3Header.mp3_meta(payload))
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.bitrate_kbps").cast("long").as("bitrate_kbps"),
        col("meta.sample_rate").cast("long").as("sample_rate"),
        col("meta.channels").cast("long").as("channels"),
        col("meta.has_id3").as("has_id3"))
      .orderBy(col("doc_id"))
  }

  /** X34: streaming Welch monitor (see
    * [[graft.streaming.Streams.streamingWelch]]) — R141 maintained from
    * three longs per (group, side); same input, same oracle as
    * `q_welch_t2`.
    */
  def streamWelch(s: SparkSession, dir: String): DataFrame = {
    val rows = t(s, dir, "lineitem")
      .select(col("l_linestatus").as("grp"),
        (col("l_returnflag") === "R").as("s"),
        col("l_quantity").cast("long").as("v"))
    graft.streaming.Streams.streamingWelch(s, rows,
        queryName = s"gate_swelch_${System.nanoTime()}")
      .orderBy(col("grp"))
  }

  // ---------------------------------------------------------------- oracle

  /** R137 oracle: same IVF CTE as S13/S14, graded CASE relevance, the
    * discount table inlined from the SAME Scala constant the operator
    * compiles into its plan.
    */
  private val ndcgSql: String = {
    val discCase = graft.operators.Eval.ndcgDiscountsPpm(5).zipWithIndex
      .map { case (d, i) => s"WHEN ${i + 1} THEN $d" }.mkString(" ")
    s"""WITH ivf AS (
       |  SELECT * FROM (
       |${QueriesData.sql("ann_ivf_topk")}
       |  ) t
       |), lab AS (SELECT vec_id, label FROM embeddings),
       |g AS (
       |  SELECT i.query_id, i.rnk AS pos,
       |    CASE WHEN i.cand_id = i.query_id THEN 0
       |      WHEN cl.label = ql.label THEN 2
       |      WHEN ABS(cl.label - ql.label) = 1 THEN 1
       |      ELSE 0 END AS rel
       |  FROM ivf i
       |  JOIN lab cl ON i.cand_id = cl.vec_id
       |  JOIN lab ql ON i.query_id = ql.vec_id
       |  WHERE i.rnk <= 5
       |), r AS (
       |  SELECT query_id, rel, pos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, pos) AS ipos
       |  FROM g
       |), a AS (
       |  SELECT query_id,
       |    CAST(SUM(rel * CASE pos $discCase END) AS BIGINT) AS dcg_ppm,
       |    CAST(SUM(rel * CASE ipos $discCase END) AS BIGINT) AS idcg_ppm
       |  FROM r GROUP BY 1
       |)
       |SELECT query_id, dcg_ppm, idcg_ppm,
       |  CASE WHEN idcg_ppm = 0 THEN NULL
       |    ELSE CAST(dcg_ppm * 1000000 // idcg_ppm AS BIGINT)
       |  END AS ndcg_ppm
       |FROM a ORDER BY query_id""".stripMargin
  }

  private val kendallSql: String =
    """WITH e AS (
      |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS x,
      |    CAST(EXTRACT(month FROM CAST(l_shipdate AS DATE)) AS BIGINT) AS y
      |  FROM lineitem
      |), cells AS (
      |  SELECT grp, x, y, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM e GROUP BY 1, 2, 3
      |), cd AS (
      |  SELECT c1.grp,
      |    CAST(SUM(CASE WHEN c2.y < c1.y THEN c1.c * c2.c ELSE 0 END)
      |      AS BIGINT) AS nc,
      |    CAST(SUM(CASE WHEN c2.y > c1.y THEN c1.c * c2.c ELSE 0 END)
      |      AS BIGINT) AS nd
      |  FROM cells c1 JOIN cells c2
      |    ON c1.grp = c2.grp AND c2.x < c1.x AND c2.y <> c1.y
      |  GROUP BY 1
      |), mx AS (
      |  SELECT grp, CAST(SUM(nx * (nx - 1) // 2) AS BIGINT) AS tx
      |  FROM (SELECT grp, x, CAST(SUM(c) AS BIGINT) AS nx
      |        FROM cells GROUP BY 1, 2) t
      |  GROUP BY 1
      |), my AS (
      |  SELECT grp, CAST(SUM(ny * (ny - 1) // 2) AS BIGINT) AS ty
      |  FROM (SELECT grp, y, CAST(SUM(c) AS BIGINT) AS ny
      |        FROM cells GROUP BY 1, 2) t
      |  GROUP BY 1
      |), nn AS (
      |  SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM cells GROUP BY 1
      |), j AS (
      |  SELECT nn.grp, nn.n, COALESCE(cd.nc, 0) AS nc,
      |    COALESCE(cd.nd, 0) AS nd, mx.tx, my.ty, n * (n - 1) // 2 AS n0
      |  FROM nn LEFT JOIN cd ON cd.grp = nn.grp
      |  JOIN mx ON mx.grp = nn.grp JOIN my ON my.grp = nn.grp
      |)
      |SELECT grp, n, nc, nd, tx, ty,
      |  CASE WHEN n0 = 0 THEN NULL
      |    WHEN nc >= nd THEN
      |      CAST((CAST(nc AS HUGEINT) - nd) * 1000000 // n0 AS BIGINT)
      |    ELSE
      |      -CAST((CAST(nd AS HUGEINT) - nc) * 1000000 // n0 AS BIGINT)
      |  END AS tau_a_ppm,
      |  CASE WHEN n0 = 0
      |      OR (CAST(n0 AS HUGEINT) - tx) * (n0 - ty) <= 0 THEN NULL
      |    WHEN nc >= nd THEN
      |      CAST((CAST(nc AS HUGEINT) - nd) * (nc - nd) * 1000000
      |        // ((CAST(n0 AS HUGEINT) - tx) * (n0 - ty)) AS BIGINT)
      |    ELSE
      |      -CAST((CAST(nd AS HUGEINT) - nc) * (nd - nc) * 1000000
      |        // ((CAST(n0 AS HUGEINT) - tx) * (n0 - ty)) AS BIGINT)
      |  END AS tau_b_sq_ppm
      |FROM j ORDER BY grp""".stripMargin

  /** R139 oracle: 2 chained authority/hub rounds, each normalized by a
    * scalar subquery — the R134 CTE idiom doubled.
    */
  private val hitsSql: String = {
    def round(r: Int): String =
      s"""ra$r AS (
         |  SELECT e.dst AS node, SUM(h.h) AS r
         |  FROM e JOIN h${r - 1} h ON h.node = e.src GROUP BY 1
         |), a$r AS (
         |  SELECT node, r * 1000000 // (SELECT MAX(r) FROM ra$r) AS a
         |  FROM ra$r
         |), rh$r AS (
         |  SELECT e.src AS node, SUM(a.a) AS r
         |  FROM e JOIN a$r a ON a.node = e.dst GROUP BY 1
         |), h$r AS (
         |  SELECT node, r * 1000000 // (SELECT MAX(r) FROM rh$r) AS h
         |  FROM rh$r
         |)""".stripMargin
    s"""WITH e AS (
       |  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |), h0 AS (
       |  SELECT DISTINCT src AS node, CAST(1000000 AS HUGEINT) AS h FROM e
       |),
       |${(1 to 2).map(round).mkString(",\n")}
       |SELECT COALESCE(h2.node, a2.node) AS node,
       |  CAST(h2.h AS BIGINT) AS hub_ppm, CAST(a2.a AS BIGINT) AS auth_ppm
       |FROM h2 FULL OUTER JOIN a2 ON a2.node = h2.node
       |ORDER BY node""".stripMargin
  }

  private val linkPredictSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |und AS (
      |  SELECT a.l_partkey AS a, b.l_partkey AS b
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |), e AS (
      |  SELECT a AS src, b AS dst FROM und
      |  UNION ALL SELECT b, a FROM und
      |), deg AS (
      |  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
      |  FROM e GROUP BY 1
      |), centers AS (
      |  SELECT node FROM deg WHERE deg <= 96
      |), w AS (
      |  SELECT e1.dst AS u, e2.dst AS v, CAST(COUNT(*) AS BIGINT) AS common
      |  FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
      |  JOIN centers c ON c.node = e1.src
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |), cand AS (
      |  SELECT w.u, w.v, w.common
      |  FROM w LEFT JOIN und ON und.a = w.u AND und.b = w.v
      |  WHERE und.a IS NULL
      |)
      |SELECT c.u, c.v, c.common, du.deg AS deg_u, dv.deg AS deg_v,
      |  CAST(c.common * 1000000 // (du.deg + dv.deg - c.common) AS BIGINT)
      |    AS jaccard_ppm
      |FROM cand c
      |JOIN deg du ON du.node = c.u JOIN deg dv ON dv.node = c.v
      |ORDER BY jaccard_ppm DESC, u, v LIMIT 500""".stripMargin

  private val welchSql: String =
    """WITH e AS (
      |  SELECT l_linestatus AS grp, (l_returnflag = 'R') AS s,
      |    CAST(l_quantity AS BIGINT) AS v
      |  FROM lineitem
      |), m AS (
      |  SELECT grp, s, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(v) AS BIGINT) AS sx, SUM(CAST(v AS HUGEINT) * v) AS qx
      |  FROM e GROUP BY 1, 2
      |), a AS (SELECT grp, n AS n_a, sx AS s_a, qx AS q_a FROM m WHERE s),
      |b AS (SELECT grp, n AS n_b, sx AS s_b, qx AS q_b FROM m WHERE NOT s),
      |j AS (
      |  SELECT COALESCE(a.grp, b.grp) AS grp,
      |    COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
      |    COALESCE(s_a, 0) AS s_a, COALESCE(s_b, 0) AS s_b,
      |    COALESCE(q_a, 0) AS q_a, COALESCE(q_b, 0) AS q_b
      |  FROM a FULL OUTER JOIN b ON a.grp = b.grp
      |), c AS (
      |  SELECT grp, n_a, n_b, s_a, s_b,
      |    CAST(s_a AS HUGEINT) * n_b - CAST(s_b AS HUGEINT) * n_a AS d,
      |    n_a * q_a - CAST(s_a AS HUGEINT) * s_a AS aa,
      |    n_b * q_b - CAST(s_b AS HUGEINT) * s_b AS bb
      |  FROM j
      |), f AS (
      |  SELECT grp, n_a, n_b, s_a, s_b, d,
      |    aa * (CAST(n_b AS HUGEINT) * n_b) * (n_b - 1)
      |      + bb * (CAST(n_a AS HUGEINT) * n_a) * (n_a - 1) AS den
      |  FROM c
      |)
      |SELECT grp, n_a, n_b, s_a, s_b,
      |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
      |    WHEN d >= 0 THEN
      |      CAST(d * 1000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
      |    ELSE
      |      -CAST((-d) * 1000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
      |  END AS mean_diff_milli,
      |  CASE WHEN n_a < 2 OR n_b < 2 OR den <= 0 THEN NULL
      |    ELSE CAST(d * d * (n_a - 1) * (n_b - 1) * 1000 // den AS BIGINT)
      |  END AS t2_milli
      |FROM f ORDER BY grp""".stripMargin

  private val holtWintersSql: String =
    """WITH RECURSIVE e AS (
      |  SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS k,
      |    CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) * 100
      |      + EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS ym,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1, 2
      |), r AS (
      |  SELECT k, ym, x, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ym) AS rn
      |  FROM e
      |), g AS (
      |  SELECT k, CAST(SUM(x * 1000) // COUNT(*) AS BIGINT) AS gmean
      |  FROM r GROUP BY 1
      |), sidx AS (
      |  SELECT r.k, CAST((rn - 1) % 12 + 1 AS BIGINT) AS phase,
      |    CAST(SUM(x * 1000) // COUNT(*) - MAX(g.gmean) AS BIGINT) AS s_milli
      |  FROM r JOIN g ON g.k = r.k GROUP BY 1, 2
      |), rec AS (
      |  SELECT r.k, r.ym, r.x, r.rn,
      |    CAST((r.rn - 1) % 12 + 1 AS BIGINT) AS phase, si.s_milli,
      |    CAST(r.x * 1000 - si.s_milli AS BIGINT) AS l,
      |    CAST(0 AS BIGINT) AS b
      |  FROM r JOIN sidx si
      |    ON si.k = r.k AND si.phase = (r.rn - 1) % 12 + 1
      |  WHERE r.rn = 1
      |  UNION ALL
      |  SELECT r.k, r.ym, r.x, r.rn,
      |    CAST((r.rn - 1) % 12 + 1 AS BIGINT), si.s_milli,
      |    CAST((200000 * (r.x * 1000 - si.s_milli)
      |      + 800000 * (rec.l + rec.b)) // 1000000 AS BIGINT) AS l,
      |    CAST((100000 * ((200000 * (r.x * 1000 - si.s_milli)
      |        + 800000 * (rec.l + rec.b)) // 1000000 - rec.l)
      |      + 900000 * rec.b) // 1000000 AS BIGINT) AS b
      |  FROM r JOIN rec ON r.k = rec.k AND r.rn = rec.rn + 1
      |  JOIN sidx si ON si.k = r.k AND si.phase = (r.rn - 1) % 12 + 1
      |)
      |SELECT rec.k AS key, rec.ym AS id, rec.ym AS ts_sec, rec.x,
      |  rec.phase, rec.s_milli AS seasonal_milli, rec.l AS level_milli,
      |  rec.b AS trend_milli,
      |  CAST(rec.l + rec.b + COALESCE(sn.s_milli, 0) AS BIGINT)
      |    AS forecast_milli
      |FROM rec LEFT JOIN sidx sn
      |  ON sn.k = rec.k AND sn.phase = rec.rn % 12 + 1
      |ORDER BY key, id""".stripMargin

  /** R143 oracle: the R142 recursive CTE embedded as a subquery, then
    * per-key LAG baselines and one aggregate.
    */
  private val forecastErrorSql: String =
    s"""WITH base AS (
       |  SELECT * FROM (
       |${holtWintersSql.replace("ORDER BY key, id", "")}
       |  ) t
       |), l AS (
       |  SELECT key, id, x, forecast_milli,
       |    LAG(x) OVER w AS x_prev,
       |    LAG(forecast_milli) OVER w AS f_prev,
       |    LAG(x, 12) OVER w AS x_prevm
       |  FROM base WINDOW w AS (PARTITION BY key ORDER BY id)
       |), a AS (
       |  SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(ABS(x * 1000 - f_prev)) AS BIGINT) AS ae_model,
       |    CAST(COUNT(f_prev) AS BIGINT) AS n_model,
       |    CAST(SUM(ABS(x - x_prev) * 1000) AS BIGINT) AS ae_naive,
       |    CAST(COUNT(x_prev) AS BIGINT) AS n_naive,
       |    CAST(SUM(ABS(x - x_prevm) * 1000) AS BIGINT) AS ae_snaive,
       |    CAST(COUNT(x_prevm) AS BIGINT) AS n_snaive
       |  FROM l GROUP BY 1
       |)
       |SELECT key, n,
       |  CASE WHEN n_model = 0 THEN NULL
       |    ELSE ae_model // n_model END AS mae_model_milli,
       |  CASE WHEN n_naive = 0 THEN NULL
       |    ELSE ae_naive // n_naive END AS mae_naive_milli,
       |  CASE WHEN n_snaive = 0 THEN NULL
       |    ELSE ae_snaive // n_snaive END AS mae_snaive_milli,
       |  CASE WHEN n_model = 0 OR COALESCE(ae_naive, 0) = 0 THEN NULL
       |    ELSE CAST(CAST(ae_model AS HUGEINT) * n_naive * 1000000
       |      // (CAST(n_model AS HUGEINT) * ae_naive) AS BIGINT)
       |  END AS mase_ppm,
       |  CASE WHEN n_model = 0 OR COALESCE(ae_snaive, 0) = 0 THEN NULL
       |    ELSE CAST(CAST(ae_model AS HUGEINT) * n_snaive * 1000000
       |      // (CAST(n_model AS HUGEINT) * ae_snaive) AS BIGINT)
       |  END AS smase_ppm
       |FROM a ORDER BY key""".stripMargin

  private val seasonalStrengthSql: String =
    """WITH e AS (
      |  SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS k,
      |    CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) * 100
      |      + EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS ym,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1, 2
      |), r AS (
      |  SELECT k, ym, x, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ym) AS rn
      |  FROM e
      |), g AS (
      |  SELECT k, CAST(SUM(x * 1000) // COUNT(*) AS BIGINT) AS gmean
      |  FROM r GROUP BY 1
      |), sidx AS (
      |  SELECT r.k, CAST((rn - 1) % 12 + 1 AS BIGINT) AS phase,
      |    CAST(SUM(x * 1000) // COUNT(*) - MAX(g.gmean) AS BIGINT) AS s_milli
      |  FROM r JOIN g ON g.k = r.k GROUP BY 1, 2
      |), d AS (
      |  SELECT r.k, r.x * 1000 AS xm, r.x * 1000 - si.s_milli AS dm
      |  FROM r JOIN sidx si
      |    ON si.k = r.k AND si.phase = (r.rn - 1) % 12 + 1
      |), a AS (
      |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(xm AS HUGEINT)) AS sx, SUM(CAST(dm AS HUGEINT)) AS sd
      |  FROM d GROUP BY 1
      |), v AS (
      |  SELECT d.k, MAX(a.n) AS n,
      |    SUM((a.n * CAST(d.xm AS HUGEINT) - a.sx)
      |      * (a.n * CAST(d.xm AS HUGEINT) - a.sx)) AS vx,
      |    SUM((a.n * CAST(d.dm AS HUGEINT) - a.sd)
      |      * (a.n * CAST(d.dm AS HUGEINT) - a.sd)) AS vd
      |  FROM d JOIN a ON a.k = d.k GROUP BY 1
      |)
      |SELECT k AS key, n,
      |  CASE WHEN vx = 0 THEN NULL
      |    ELSE CAST(1000000 - vd * 1000000 // vx AS BIGINT)
      |  END AS strength_ppm
      |FROM v ORDER BY key""".stripMargin

  private val vocabOverlapSql: String =
    """WITH sv AS (
      |  SELECT DISTINCT source AS src, w
      |  FROM (SELECT source, unnest(str_split(text, ' ')) AS w
      |        FROM documents) t
      |  WHERE w <> ''
      |), sizes AS (
      |  SELECT src, CAST(COUNT(*) AS BIGINT) AS nv FROM sv GROUP BY 1
      |), inter AS (
      |  SELECT a.src AS src_a, b.src AS src_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_inter
      |  FROM sv a JOIN sv b ON a.w = b.w AND a.src < b.src
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT a.src AS src_a, b.src AS src_b, a.nv AS nv_a, b.nv AS nv_b
      |  FROM sizes a JOIN sizes b ON a.src < b.src
      |)
      |SELECT p.src_a, p.src_b, p.nv_a, p.nv_b,
      |  COALESCE(i.n_inter, 0) AS n_inter,
      |  CAST(COALESCE(i.n_inter, 0) * 1000000
      |    // (p.nv_a + p.nv_b - COALESCE(i.n_inter, 0)) AS BIGINT)
      |    AS jaccard_ppm
      |FROM pairs p LEFT JOIN inter i
      |  ON i.src_a = p.src_a AND i.src_b = p.src_b
      |ORDER BY p.src_a, p.src_b""".stripMargin

  private val decomposeMaSql: String =
    """WITH e AS (
      |  SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS k,
      |    CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) * 100
      |      + EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS ym,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1, 2
      |), r AS (
      |  SELECT k, ym, x, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ym) AS rn
      |  FROM e
      |), tw AS (
      |  SELECT k, ym, x, rn, CAST((rn - 1) % 12 + 1 AS BIGINT) AS phase,
      |    CAST(SUM(x * 1000) OVER w // COUNT(*) OVER w AS BIGINT) AS trend
      |  FROM r WINDOW w AS (PARTITION BY k ORDER BY rn
      |    ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
      |), dt AS (
      |  SELECT k, ym, x, phase, trend, x * 1000 - trend AS det FROM tw
      |), s AS (
      |  SELECT k, phase, CAST(SUM(det) // COUNT(*) AS BIGINT) AS s_milli
      |  FROM dt GROUP BY 1, 2
      |)
      |SELECT dt.k AS key, dt.ym AS id, dt.x, dt.phase,
      |  dt.trend AS trend_milli, s.s_milli AS seasonal_milli,
      |  CAST(dt.det - s.s_milli AS BIGINT) AS remainder_milli
      |FROM dt JOIN s ON s.k = dt.k AND s.phase = dt.phase
      |ORDER BY key, id""".stripMargin

  private val trendTestSql: String =
    """WITH e AS (
      |  SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS k,
      |    CAST((EXTRACT(year FROM CAST(o_orderdate AS DATE)) - 1992) * 12
      |      + EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1, 2
      |), p AS (
      |  SELECT a.k, b.x - a.x AS dx, b.t - a.t AS dt
      |  FROM e a JOIN e b ON a.k = b.k AND b.t > a.t
      |), sl AS (
      |  SELECT k, (dx * 1000) // dt AS slope,
      |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY (dx * 1000) // dt)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY k) AS m
      |  FROM p WHERE dt > 0
      |), med AS (
      |  SELECT k, CAST(slope AS BIGINT) AS slope_milli
      |  FROM sl WHERE rn = (m + 1) // 2
      |), st AS (
      |  SELECT k,
      |    CAST(SUM(CASE WHEN dx > 0 THEN 1 WHEN dx < 0 THEN -1 ELSE 0 END)
      |      AS BIGINT) AS s_stat,
      |    CAST(COUNT(*) AS BIGINT) AS n_pairs
      |  FROM p GROUP BY 1
      |), nn AS (
      |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1
      |), ties AS (
      |  SELECT k, CAST(SUM(t2 * (t2 - 1) * (2 * t2 + 5)) AS BIGINT) AS tt
      |  FROM (SELECT k, CAST(COUNT(*) AS BIGINT) AS t2
      |        FROM e GROUP BY k, x) g
      |  GROUP BY 1
      |)
      |SELECT nn.k AS key, nn.n,
      |  COALESCE(st.n_pairs, 0) AS n_pairs,
      |  COALESCE(st.s_stat, 0) AS s_stat, med.slope_milli,
      |  CASE WHEN COALESCE(st.s_stat, 0) = 0 THEN CAST(0 AS BIGINT)
      |    WHEN nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tt <= 0 THEN NULL
      |    ELSE CAST((ABS(st.s_stat) - 1) * (ABS(st.s_stat) - 1)
      |      * 18 * 1000000
      |      // (nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tt) AS BIGINT)
      |  END AS z2_ppm
      |FROM nn LEFT JOIN st ON st.k = nn.k
      |JOIN ties ON ties.k = nn.k
      |LEFT JOIN med ON med.k = nn.k
      |ORDER BY key""".stripMargin

  private val runsTestSql: String =
    """WITH e AS (
      |  SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS k,
      |    CAST((EXTRACT(year FROM CAST(o_orderdate AS DATE)) - 1992) * 12
      |      + EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1, 2
      |), d AS (
      |  SELECT k, t, x, x - LAG(x) OVER (PARTITION BY k ORDER BY t) AS dx
      |  FROM e
      |), sgn AS (
      |  SELECT k, t, CASE WHEN dx > 0 THEN 1 ELSE -1 END AS s
      |  FROM d WHERE dx IS NOT NULL AND dx <> 0
      |), runs AS (
      |  SELECT k, CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_pos,
      |    CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
      |    CAST(1 + SUM(chg) AS BIGINT) AS n_runs
      |  FROM (
      |    SELECT k, s,
      |      CASE WHEN LAG(s) OVER (PARTITION BY k ORDER BY t) IS NOT NULL
      |        AND LAG(s) OVER (PARTITION BY k ORDER BY t) <> s
      |      THEN 1 ELSE 0 END AS chg
      |    FROM sgn) t2
      |  GROUP BY 1
      |), rz AS (
      |  SELECT k, n_pos, n_neg, n_runs,
      |    n_runs * (n_pos + n_neg) - (n_pos + n_neg)
      |      - 2 * n_pos * n_neg AS num,
      |    n_pos + n_neg AS bign, n_pos * n_neg AS m
      |  FROM runs
      |), tp AS (
      |  SELECT k, CAST(SUM(CASE WHEN (pv < x AND x > nx)
      |      OR (pv > x AND x < nx) THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_turning
      |  FROM (SELECT k, x,
      |      LAG(x) OVER (PARTITION BY k ORDER BY t) AS pv,
      |      LEAD(x) OVER (PARTITION BY k ORDER BY t) AS nx
      |    FROM e) t3
      |  GROUP BY 1
      |), nn AS (
      |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1
      |)
      |SELECT nn.k AS key, nn.n,
      |  COALESCE(rz.n_pos, 0) AS n_pos, COALESCE(rz.n_neg, 0) AS n_neg,
      |  COALESCE(rz.n_runs, 0) AS n_runs,
      |  CASE WHEN COALESCE(rz.n_pos, 0) = 0 OR COALESCE(rz.n_neg, 0) = 0
      |      OR 2 * rz.m <= rz.bign THEN NULL
      |    ELSE CAST(CAST(rz.num AS HUGEINT) * rz.num * (rz.bign - 1)
      |      * 1000000
      |      // (2 * CAST(rz.m AS HUGEINT) * (2 * rz.m - rz.bign))
      |      AS BIGINT)
      |  END AS runs_z2_ppm,
      |  tp.n_turning,
      |  CASE WHEN nn.n < 3 THEN NULL
      |    ELSE CAST(CAST(3 * tp.n_turning - 2 * (nn.n - 2) AS HUGEINT)
      |      * (3 * tp.n_turning - 2 * (nn.n - 2)) * 10 * 1000000
      |      // (16 * nn.n - 29) AS BIGINT)
      |  END AS turning_z2_ppm
      |FROM nn LEFT JOIN rz ON rz.k = nn.k JOIN tp ON tp.k = nn.k
      |ORDER BY key""".stripMargin

  private val scoreQualitySql: String =
    """WITH e AS (
      |  SELECT l_linestatus AS grp, (l_returnflag = 'R') AS y,
      |    CAST(l_quantity AS BIGINT) * 19000
      |      + CAST(ROUND(l_discount * 100) AS BIGINT) * 4000 AS p
      |  FROM lineitem
      |), c AS (
      |  SELECT grp, LEAST(p * 10 // 1000000, 9) AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS sp,
      |    SUM(CAST(p AS HUGEINT) * p) AS sp2,
      |    CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS sy,
      |    CAST(SUM(CASE WHEN y THEN p ELSE 0 END) AS BIGINT) AS spy
      |  FROM e GROUP BY 1, 2
      |)
      |SELECT grp, CAST(SUM(n) AS BIGINT) AS n,
      |  CAST(SUM(sy) AS BIGINT) AS n_pos,
      |  CAST(SUM(sp) // SUM(n) AS BIGINT) AS mean_score_ppm,
      |  CAST(SUM(sy) * 1000000 // SUM(n) AS BIGINT) AS base_rate_ppm,
      |  CAST((SUM(sp2) - 2000000 * CAST(SUM(spy) AS HUGEINT)
      |    + CAST(1000000000000 AS HUGEINT) * SUM(sy)) // SUM(n)
      |    AS BIGINT) AS brier_ppm2,
      |  CAST(SUM(ABS(CAST(sp AS HUGEINT) - 1000000 * sy)) // SUM(n)
      |    AS BIGINT) AS ece_ppm
      |FROM c GROUP BY grp ORDER BY grp""".stripMargin

  /** R152 oracle: both retrieval CTEs verbatim, per-term floored RRF
    * contributions, fused re-rank.
    */
  private val rrfFusionSql: String =
    s"""WITH bf AS (
       |  SELECT * FROM (
       |${QueriesData.sql("ann_bruteforce_topk")}
       |  ) t
       |), ivf AS (
       |  SELECT * FROM (
       |${QueriesData.sql("ann_ivf_topk")}
       |  ) t
       |), scored AS (
       |  SELECT query_id, cand_id, 1000000 // (60 + rnk) AS s FROM bf
       |  UNION ALL
       |  SELECT query_id, cand_id, 1000000 // (60 + rnk) AS s FROM ivf
       |), agg AS (
       |  SELECT query_id, cand_id, CAST(SUM(s) AS BIGINT) AS rrf_ppm,
       |    CAST(COUNT(*) AS BIGINT) AS n_lists
       |  FROM scored GROUP BY 1, 2
       |), rk AS (
       |  SELECT query_id, cand_id, rrf_ppm, n_lists,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rrf_ppm DESC, cand_id) AS BIGINT) AS rnk
       |  FROM agg
       |)
       |SELECT query_id, cand_id, rrf_ppm, n_lists, rnk
       |FROM rk WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  /** Word-trigram shingle multiset CTE shared by T29/T30 — the
    * text_novelty construction WITHOUT the per-doc distinct (frequency
    * counting is multiset by definition).
    */
  private val shingleCte: String =
    """g0 AS (
      |  SELECT ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS w
      |  FROM (SELECT ts, unnest(generate_series(1, len(ts) - 2)) AS i
      |        FROM (SELECT str_split(text, ' ') AS ts
      |              FROM documents) d) t
      |), wf AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS r
      |  FROM g0 WHERE w <> '' GROUP BY 1
      |)""".stripMargin

  private val goodTuringSql: String =
    s"""WITH $shingleCte,
       |nr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM wf GROUP BY 1),
       |tot AS (SELECT CAST(SUM(r * n_r) AS BIGINT) AS t FROM nr)
       |SELECT nr.r, nr.n_r,
       |  CASE WHEN nx.n_r IS NULL THEN NULL
       |    ELSE CAST((nr.r + 1) * nx.n_r * 1000000 // nr.n_r AS BIGINT)
       |  END AS r_star_ppm,
       |  CAST(nr.r * nr.n_r * 1000000 // tot.t AS BIGINT) AS mass_ppm
       |FROM nr LEFT JOIN nr nx ON nx.r = nr.r + 1 CROSS JOIN tot
       |ORDER BY nr.r""".stripMargin

  private val zipfSql: String =
    s"""WITH $shingleCte,
       |rk AS (
       |  SELECT w, r AS freq,
       |    CAST(ROW_NUMBER() OVER (ORDER BY r DESC, w) AS BIGINT) AS rank
       |  FROM wf
       |), top AS (
       |  SELECT rank * freq AS tp FROM rk WHERE rank = 1
       |)
       |SELECT rank, w, freq, rank * freq AS rank_freq,
       |  CAST(rank * freq * 1000000 // top.tp AS BIGINT) AS vs_top_ppm
       |FROM rk CROSS JOIN top
       |WHERE rank <= 100 ORDER BY rank""".stripMargin

  private val netChangesSql: String =
    """WITH c AS (
      |  SELECT o_orderkey % 1000 AS key, o_orderkey AS seq,
      |    CASE WHEN o_orderkey % 7 = 6 THEN 'D'
      |         WHEN o_orderkey % 7 >= 3 THEN 'U'
      |         ELSE 'I' END AS op,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS payload
      |  FROM orders
      |), a AS (
      |  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_ops,
      |    arg_min(op, seq) AS first_op, arg_max(op, seq) AS last_op,
      |    arg_max(payload, seq) AS pl
      |  FROM c GROUP BY 1
      |)
      |SELECT key, n_ops, first_op, last_op,
      |  CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'NOOP'
      |       WHEN first_op = 'I' THEN 'INSERT'
      |       WHEN last_op = 'D' THEN 'DELETE'
      |       ELSE 'UPDATE' END AS net_op,
      |  CASE WHEN first_op = 'I' AND last_op = 'D' THEN NULL
      |       WHEN last_op = 'D' THEN NULL
      |       ELSE pl END AS payload
      |FROM a ORDER BY key""".stripMargin

  /** M7 oracle: the expected fields recomputed from the id alone — the
    * byte-level decode must be invisible.
    */
  private val mp3MetaSql: String = {
    val brCase = (1 to 14).map(i =>
      s"WHEN ${i} THEN ${graft.multimodal.Mp3Header.BitratesKbps(i)}")
      .mkString(" ")
    s"""SELECT doc_id, 'mp3' AS format,
       |  CAST(CASE doc_id % 14 + 1 $brCase END AS BIGINT) AS bitrate_kbps,
       |  CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
       |    ELSE 32000 END AS BIGINT) AS sample_rate,
       |  CAST(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 2 END AS BIGINT)
       |    AS channels,
       |  (doc_id % 3 = 0) AS has_id3
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q_eval_ndcg" -> ndcgSql,
    "q_kendall" -> kendallSql,
    "graph_hits" -> hitsSql,
    "graph_link_predict" -> linkPredictSql,
    "q_welch_t2" -> welchSql,
    "q_holt_winters" -> holtWintersSql,
    "q_forecast_error" -> forecastErrorSql,
    "q_seasonal_strength" -> seasonalStrengthSql,
    "text_vocab_overlap" -> vocabOverlapSql,
    "q_decompose_ma" -> decomposeMaSql,
    "q_trend_test" -> trendTestSql,
    "q_runs_test" -> runsTestSql,
    "q_score_quality" -> scoreQualitySql,
    "q_rrf_fusion" -> rrfFusionSql,
    "text_good_turing" -> goodTuringSql,
    "text_zipf" -> zipfSql,
    "mm_mp3_meta" -> mp3MetaSql,
    "q_permutation_test" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS grp, (o_custkey % 2 = 0) AS s,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
        |    o_orderkey AS id
        |  FROM orders
        |), obs AS (
        |  SELECT grp,
        |    CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN s THEN v ELSE 0 END) AS BIGINT) AS s_a,
        |    CAST(SUM(v) AS BIGINT) AS st
        |  FROM base GROUP BY 1
        |), o2 AS (
        |  SELECT grp, n_a, n - n_a AS n_b, s_a, st - s_a AS s_b, st,
        |    ABS(CAST(s_a AS HUGEINT) * (n - n_a)
        |      - CAST(st - s_a AS HUGEINT) * n_a) AS dobs
        |  FROM obs
        |), perm AS (
        |  SELECT b.b, base.grp, base.v, base.id,
        |    CAST(('0x' || substr(md5(base.grp || ':'
        |      || CAST(b.b AS VARCHAR) || ':' || CAST(base.id AS VARCHAR)),
        |      1, 12)) AS BIGINT) AS h
        |  FROM base
        |  CROSS JOIN (SELECT unnest(generate_series(1, 40)) AS b) b
        |), rk AS (
        |  SELECT grp, b, v,
        |    ROW_NUMBER() OVER (PARTITION BY grp, b ORDER BY h, id) AS r
        |  FROM perm
        |), ps AS (
        |  SELECT rk.grp, rk.b,
        |    CAST(SUM(CASE WHEN rk.r <= o2.n_a THEN rk.v ELSE 0 END)
        |      AS BIGINT) AS sa
        |  FROM rk JOIN o2 ON o2.grp = rk.grp
        |  GROUP BY 1, 2
        |), ex AS (
        |  SELECT o2.grp,
        |    CAST(SUM(CASE WHEN ABS(CAST(ps.sa AS HUGEINT) * o2.n_b
        |        - CAST(o2.st - ps.sa AS HUGEINT) * o2.n_a) >= o2.dobs
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        |  FROM ps JOIN o2 ON o2.grp = ps.grp GROUP BY 1
        |)
        |SELECT o2.grp, o2.n_a, o2.n_b,
        |  CASE WHEN o2.n_a = 0 OR o2.n_b = 0 THEN NULL
        |    WHEN CAST(o2.s_a AS HUGEINT) * o2.n_b
        |         - CAST(o2.s_b AS HUGEINT) * o2.n_a >= 0
        |    THEN CAST((CAST(o2.s_a AS HUGEINT) * o2.n_b
        |      - CAST(o2.s_b AS HUGEINT) * o2.n_a) * 1000
        |      // (CAST(o2.n_a AS HUGEINT) * o2.n_b) AS BIGINT)
        |    ELSE -CAST((CAST(o2.s_b AS HUGEINT) * o2.n_a
        |      - CAST(o2.s_a AS HUGEINT) * o2.n_b) * 1000
        |      // (CAST(o2.n_a AS HUGEINT) * o2.n_b) AS BIGINT)
        |  END AS mean_diff_milli,
        |  ex.n_extreme,
        |  CAST((1 + ex.n_extreme) * 1000000 // 41 AS BIGINT) AS p_ppm
        |FROM o2 JOIN ex ON ex.grp = o2.grp ORDER BY o2.grp""".stripMargin,
    "q_bootstrap_ci" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
        |    o_orderkey AS id
        |  FROM orders
        |), pos AS (
        |  SELECT grp, v, id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v, id)
        |      AS BIGINT) AS pos,
        |    CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
        |  FROM base
        |), draws AS (
        |  SELECT p.grp, b.b, p.n,
        |    CAST(('0x' || substr(md5(p.grp || ':' || CAST(b.b AS VARCHAR)
        |      || ':' || CAST(p.pos AS VARCHAR)), 1, 12)) AS BIGINT)
        |      % p.n + 1 AS idx
        |  FROM pos p
        |  CROSS JOIN (SELECT unnest(generate_series(1, 40)) AS b) b
        |), means AS (
        |  SELECT d.grp, d.b,
        |    CAST(SUM(p2.v) AS BIGINT) // COUNT(*) AS mean_b
        |  FROM draws d JOIN pos p2 ON p2.grp = d.grp AND p2.pos = d.idx
        |  GROUP BY 1, 2
        |), rk AS (
        |  SELECT grp, mean_b,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY mean_b, b) AS r
        |  FROM means
        |), ci AS (
        |  SELECT grp, MAX(CASE WHEN r = 1 THEN mean_b END) AS ci_lo,
        |    MAX(CASE WHEN r = 39 THEN mean_b END) AS ci_hi
        |  FROM rk GROUP BY 1
        |), pt AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) // COUNT(*) AS BIGINT) AS mean_v
        |  FROM base GROUP BY 1
        |)
        |SELECT pt.grp, pt.n, pt.mean_v, ci.ci_lo, ci.ci_hi
        |FROM pt JOIN ci ON ci.grp = pt.grp ORDER BY pt.grp""".stripMargin,
    "cdc_net_changes" -> netChangesSql,
    // X36 shares its batch twin's oracle verbatim: streaming ≡ batch
    "stream_net_changes" -> netChangesSql,
    "q_weighted_bottomk" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    GREATEST(1, LEAST(CAST(ROUND(value * 100) AS BIGINT), 10000))
        |      AS w
        |  FROM events WHERE value IS NOT NULL
        |), p AS (
        |  SELECT event_id, event_type, w,
        |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))
        |      AS BIGINT) // w AS priority
        |  FROM e WHERE w > 0
        |)
        |SELECT event_id, event_type, w, priority FROM p
        |ORDER BY priority, event_id LIMIT 200""".stripMargin,
    // X35 shares its batch twin's oracle verbatim: streaming ≡ batch
    "stream_score_quality" -> scoreQualitySql,
    // X34 shares its batch twin's oracle verbatim: streaming ≡ batch
    "stream_welch" -> welchSql)
}
