package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-6 surface growth: the exact set-similarity join (D17), the
  * survival/rank-statistics kit (R119–R123), and seed-personalized
  * PageRank (R124) — closing the id gap the round-5 wrap left open.
  * Every gate keeps the house contract: integer/ppm fixed point, one
  * final floor division on nonnegative operands, total orders completed
  * by an id column — so the DuckDB oracle lands bit-identical hashes.
  *
  * Reference anchor: README's "real-time data warehouse" use case — each
  * gate is a query an Oracle-replica analyst would run against the
  * replicated schema (order-fulfillment survival, revenue inequality,
  * order-mix drift, rank correlation of spend vs time, closeness to a
  * seed part set).
  */
object QueriesR13 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Money columns in integer cents: exact in both engines. */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(12,2)") * 100).cast("long")

  /** D17: exact set-similarity self-join (see
    * [[graft.dedup.SetSimJoin.prefixJaccardJoin]]) over word TRIGRAM
    * shingles at τ = 0.5 — word tokens are degenerate on this corpus
    * (31-word vocabulary makes every pair similar); shingles keep the
    * sets discriminative, exactly like T27's novelty unit. The oracle is
    * the quadratic co-token formulation: the prefix filter must be
    * invisible in the result (pure pruning, zero recall loss).
    */
  def dedupSetsimExact(s: SparkSession, dir: String): DataFrame =
    graft.dedup.SetSimJoin.prefixJaccardJoin(t(s, dir, "documents"),
        col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3),
        tauPpm = 500000L)
      .orderBy(col("a"), col("b"))

  /** R119: Kaplan–Meier order-fulfillment survival (see
    * [[graft.operators.Survival.kaplanMeier]]) — per order priority,
    * the fraction of orders still unshipped after t WEEKS. Subjects are
    * orders; duration = order date → latest line shipment (clamped at 0
    * and floored to weeks — both engines' integer division agrees on
    * nonnegative operands); an order still open (status O/P) leaves the
    * risk set censored, only fulfilled orders (F) count as events. The
    * oracle replays the truncating ppm product as a recursive CTE (the
    * R116 EWMA idiom).
    */
  def qSurvivalKm(s: SparkSession, dir: String): DataFrame = {
    val subj = t(s, dir, "orders")
      .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderstatus"), col("o_orderdate"))
      .agg(max(col("l_shipdate")).as("last_ship"))
      .select(col("o_orderpriority"),
        expr("""greatest(datediff(CAST(last_ship AS DATE),
               |CAST(o_orderdate AS DATE)), 0) div 7""".stripMargin)
          .cast("long").as("t_weeks"),
        (col("o_orderstatus") === "F").as("obs"))
    graft.operators.Survival.kaplanMeier(subj, col("o_orderpriority"),
        col("t_weeks"), col("obs"))
      .orderBy(col("grp"), col("t"))
  }

  /** R124: personalized PageRank (see
    * [[graft.operators.Graph.personalizedPageRank]]) over the
    * co-purchase graph, personalized on the size-50 parts — "rank the
    * catalog by closeness to this seed assortment", 3 rounds, top 500.
    * Same chained-CTE oracle family as R71; the seed-restricted teleport
    * and the isolated-seed/unreachable-stays-0 contracts are what the
    * oracle additionally pins.
    */
  def graphPpr(s: SparkSession, dir: String): DataFrame = {
    val seeds = t(s, dir, "part").filter(col("p_size") === 50)
      .select(col("p_partkey").as("node"))
    // staged directed table (r9, the graphPagerank rationale)
    graft.operators.Graph.personalizedPageRankOnDir(
        QueriesR6.coPurchaseDir(s, dir), seeds, iterations = 3)
      .orderBy(col("ppr_ppm").desc, col("node"))
      .limit(500)
  }

  /** R120: Mann–Whitney U (see
    * [[graft.operators.RankStats.mannWhitneyU]]) — per line status, did
    * returned lines (R) ship in different quantities than kept ones?
    * Quantity is a 50-value integer domain, so the rank grid is
    * metadata-sized by construction. The all-'N' open-status group
    * exercises the empty-side NULL edge.
    */
  def qMannWhitney(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.mannWhitneyU(t(s, dir, "lineitem"),
        col("l_linestatus"), col("l_returnflag") === "R",
        col("l_quantity").cast("long"))
      .orderBy(col("grp"))

  /** R121: Gini coefficient (see
    * [[graft.operators.RankStats.giniCoefficient]]) of customer revenue
    * per market segment — how unequal is the revenue base? Ranks come
    * from the two-stage exact rank; custkey breaks value ties so both
    * engines walk one total order.
    */
  def qGiniCoeff(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev"))
    graft.operators.RankStats.giniCoefficient(rev, "c_mktsegment",
        col("rev"), col("c_custkey"))
      .orderBy(col("grp"))
  }

  /** R122: total-variation drift (see
    * [[graft.operators.RankStats.totalVariation]]) — per market
    * segment, how far did the order-priority mix move between the
    * pre-1995 and post-1995 order populations? Exact cross-multiplied
    * rational, no logs.
    */
  def qDriftTv(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.totalVariation(
        t(s, dir, "orders")
          .join(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey")),
        col("c_mktsegment"), col("o_orderpriority"),
        col("o_orderdate").cast("date") < lit("1995-01-01").cast("date"))
      .orderBy(col("grp"))

  /** R123: Spearman rank correlation (see
    * [[graft.operators.RankStats.spearman]]) — per order priority, do
    * order values trend over time? x = total price in cents, y = days
    * since 1992-01-01, ties broken by the unique o_orderkey so the
    * closed form stays exact.
    */
  def qSpearman(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.spearman(
        t(s, dir, "orders").select(col("o_orderpriority"),
          cents(col("o_totalprice")).as("x"),
          datediff(col("o_orderdate").cast("date"),
            lit("1992-01-01").cast("date")).cast("long").as("y"),
          col("o_orderkey")),
        "o_orderpriority", col("x"), col("y"), col("o_orderkey"))
      .orderBy(col("grp"))

  /** R125: two-sample Kolmogorov–Smirnov (see
    * [[graft.operators.RankStats.ksDistance]]) — per line status, the
    * largest CDF gap between returned and kept quantities plus WHERE it
    * opens (ks_at). Same 50-value grid as R120; the all-'N' open-status
    * group exercises the empty-side NULL edge.
    */
  def qKsTest(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.ksDistance(t(s, dir, "lineitem"),
        col("l_linestatus"), col("l_returnflag") === "R",
        col("l_quantity").cast("long"))
      .orderBy(col("grp"))

  /** R127: 1-D Wasserstein distance (see
    * [[graft.operators.RankStats.wasserstein1]]) — per line status, how
    * far (in discount points, milli-units) must mass travel to turn the
    * kept-lines discount distribution into the returned-lines one.
    * Discount is thresholded to exact integer percent (11-value grid).
    */
  def qWasserstein(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.wasserstein1(t(s, dir, "lineitem"),
        col("l_linestatus"), col("l_returnflag") === "R",
        round(col("l_discount") * 100).cast("long"))
      .orderBy(col("grp"))

  /** R126: r×c chi-square + Cramér's V² (see
    * [[graft.operators.RankStats.cramersV]]) — per market segment, is
    * order priority associated with order status? 5×3 table per group;
    * the per-cell-floor contract is replayed verbatim by the oracle.
    */
  def qCramersV(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.cramersV(
        t(s, dir, "orders")
          .join(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey")),
        col("c_mktsegment"), col("o_orderpriority"), col("o_orderstatus"))
      .orderBy(col("grp"))

  /** R128: ABC / Pareto classification (see
    * [[graft.operators.RankStats.abcClassify]]) — per market segment,
    * customers bucketed A/B/C by cumulative revenue share (70/90
    * boundaries), reported as class rollups. The oracle replays the
    * same boundary rule with a plain windowed running sum.
    */
  def qAbcClass(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev"))
    graft.operators.RankStats.abcClassify(rev, "c_mktsegment",
        col("rev"), col("c_custkey"))
      .orderBy(col("grp"), col("abc_class"))
  }

  /** D18: exact set-containment join (see
    * [[graft.dedup.SetSimJoin.prefixContainmentJoin]]) at τ = 0.8 over
    * the same trigram-shingle sets as D17 — the decontamination
    * direction: "80% of doc a's shingles appear in doc b", ordered
    * pairs, which Jaccard underrates whenever |B| ≫ |A|.
    */
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    graft.dedup.SetSimJoin.prefixContainmentJoin(t(s, dir, "documents"),
        col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3),
        tauPpm = 800000L)
      .orderBy(col("a"), col("b"))

  /** R129: two-sample quantile-shift report (see
    * [[graft.operators.RankStats.quantileShift]]) — per line status,
    * the exact type-1 quantiles of returned vs kept quantities at
    * P25/P50/P90/P99 and the shift between them.
    */
  def qQuantileShift(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.quantileShift(t(s, dir, "lineitem"),
        col("l_linestatus"), col("l_returnflag") === "R",
        col("l_quantity").cast("long"),
        Seq(250000L, 500000L, 900000L, 990000L))
      .orderBy(col("grp"), col("p_ppm"))

  /** X30: streaming total-variation drift monitor (see
    * [[graft.streaming.Streams.streamingDriftTv]]) — R122's report
    * maintained from one long of state per cell; same input, same
    * oracle as `q_drift_tv`, so streaming ≡ batch is gate-checked
    * bit-for-bit.
    */
  def streamDriftTv(s: SparkSession, dir: String): DataFrame = {
    val rows = t(s, dir, "orders")
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("grp"),
        col("o_orderpriority").as("cat"),
        (col("o_orderdate").cast("date") < lit("1995-01-01").cast("date"))
          .as("s"))
    graft.streaming.Streams.streamingDriftTv(s, rows,
        queryName = s"gate_sdrifttv_${System.nanoTime()}")
      .orderBy(col("grp"))
  }

  /** R130: Holt linear-trend smoothing (see
    * [[graft.operators.Changepoint.holt]]) — per-user spend level AND
    * trend over the event stream, α = 0.2, β = 0.1, milli-cents; the
    * oracle replays the coupled truncating recursion as a recursive CTE
    * (floor division — DuckDB's `//` — matching `Math.floorDiv` on the
    * signed trend).
    */
  def qHoltTrend(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
      round(col("value") * 100).cast("long").as("cents"))
    graft.operators.Changepoint.holt(e, col("user_id"), col("event_id"),
        col("ts_sec"), col("cents"), alphaPpm = 200000L, betaPpm = 100000L)
      .select(col("key").as("user_id"), col("id").as("event_id"),
        col("ts_sec"), col("x"), col("level_milli"), col("trend_milli"),
        col("forecast_milli"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** R131: exact autocorrelation (see
    * [[graft.operators.RankStats.autocorrelation]]) — per event type,
    * does the value series remember itself 1 and 7 ticks back? Sequence
    * positions from the two-stage exact rank on (ts, event_id).
    */
  def qAutocorr(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_type"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
      col("event_id"),
      round(col("value") * 100).cast("long").as("cents"))
    graft.operators.RankStats.autocorrelation(e, "event_type",
        col("ts_sec"), col("event_id"), col("cents"), Seq(1, 7))
      .orderBy(col("grp"), col("lag"))
  }

  /** X31: streaming quantile-shift monitor (see
    * [[graft.streaming.Streams.streamingQuantileShift]]) — R129
    * maintained from one long of state per grid cell; same input, same
    * oracle as `q_quantile_shift`, so streaming ≡ batch is gate-checked
    * bit-for-bit.
    */
  def streamQuantileShift(s: SparkSession, dir: String): DataFrame = {
    val rows = t(s, dir, "lineitem").select(
      col("l_linestatus").as("grp"),
      (col("l_returnflag") === "R").as("s"),
      col("l_quantity").cast("long").as("v"))
    graft.streaming.Streams.streamingQuantileShift(s, rows,
        Seq(250000L, 500000L, 900000L, 990000L),
        queryName = s"gate_squantshift_${System.nanoTime()}")
      .orderBy(col("grp"), col("p_ppm"))
  }

  /** R132: two-sample log-rank test (see
    * [[graft.operators.Survival.logRank]]) — same fulfillment-survival
    * subjects as R119, side = urgent priorities (1-URGENT/2-HIGH) vs
    * rest, stratified by order year: "do urgent orders ship on a
    * different curve, controlling for vintage".
    */
  def qLogrank(s: SparkSession, dir: String): DataFrame = {
    val subj = t(s, dir, "orders")
      .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderstatus"), col("o_orderdate"))
      .agg(max(col("l_shipdate")).as("last_ship"))
      .select(year(col("o_orderdate").cast("date")).as("yr"),
        (col("o_orderpriority") <= "2").as("urgent"),
        expr("""greatest(datediff(CAST(last_ship AS DATE),
               |CAST(o_orderdate AS DATE)), 0) div 7""".stripMargin)
          .cast("long").as("t_weeks"),
        (col("o_orderstatus") === "F").as("obs"))
    graft.operators.Survival.logRank(subj, col("yr"), col("urgent"),
        col("t_weeks"), col("obs"))
      .orderBy(col("grp"))
  }

  /** X32: streaming Holt (see
    * [[graft.streaming.Streams.streamingHolt]]) — R130's coupled
    * recursion with two longs of state per key; same input, same
    * oracle as `q_holt_trend`, so streaming ≡ batch is gate-checked
    * bit-for-bit.
    */
  def streamHolt(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id").as("key"),
      col("event_id").as("id"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
      round(col("value") * 100).cast("long").as("x"))
    graft.streaming.Streams.streamingHolt(s, e, alphaPpm = 200000L,
        betaPpm = 100000L, queryName = s"gate_sholt_${System.nanoTime()}")
      .select(col("key").as("user_id"), col("id").as("event_id"),
        col("ts_sec"), col("x"), col("level_milli"), col("trend_milli"),
        col("forecast_milli"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** R133: seeded betweenness centrality (see
    * [[graft.operators.Graph.betweennessSeeded]]) — the broker metric
    * over the co-purchase graph from the same %97 seed pivots as R105,
    * 3 rounds, top 500: which parts carry the seed set's shortest-path
    * traffic.
    */
  def graphBetweenness(s: SparkSession, dir: String): DataFrame = {
    val edges = QueriesR6.coPurchaseEdges(s, dir)
    // FIXED pivot budget — the point of pivot-based betweenness: the
    // sample size is an accuracy knob, constant in the data size, so
    // total work stays (pivots × edges × rounds) and grows linearly
    // with the graph. A %-derived seed set alone grows with the node
    // count and quadratically re-inflates the (seed, node) state —
    // measured 127 s at sf0.1 before the cap, linear-in-edges after.
    val seeds = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .filter(col("node") % 97 === 0).distinct()
      .orderBy(col("node")).limit(32)
    // staged directed table: the operator's defensive re-canonicalization
    // is a no-op on this input — skip it via the OnDir entry point
    graft.operators.Graph.betweennessOnDir(
        QueriesR6.coPurchaseDir(s, dir), seeds, rounds = 3)
      .orderBy(col("bc_ppm").desc, col("node"))
      .limit(500)
  }

  /** R133 oracle: R105's unrolled BFS chain (3 rounds) + the backward
    * dependency walk as chained CTEs — per-edge floor division in
    * HUGEINT, level for level what the Spark loop does.
    */
  private val betweennessSql: String = {
    def fwd(r: Int): String =
      s"""f$r AS MATERIALIZED (
         |  SELECT f.seed, e.dst AS node, $r AS dist,
         |    CAST(SUM(f.sigma) AS BIGINT) AS sigma
         |  FROM f${r - 1} f JOIN e ON e.src = f.node
         |  WHERE NOT EXISTS (SELECT 1 FROM d${r - 1} d
         |                    WHERE d.seed = f.seed AND d.node = e.dst)
         |  GROUP BY f.seed, e.dst
         |), d$r AS MATERIALIZED (
         |  SELECT * FROM d${r - 1} UNION ALL SELECT * FROM f$r
         |)""".stripMargin
    def bwd(d: Int): String =
      s"""c$d AS (
         |  SELECT v.seed, v.node,
         |    SUM(CAST(v.sigma AS HUGEINT) * (1000000 + w.delta) // w.sigma)
         |      AS delta
         |  FROM d3 v JOIN e ON e.src = v.node
         |  JOIN l${d + 1} w ON w.seed = v.seed AND w.node = e.dst
         |  WHERE v.dist = $d
         |  GROUP BY 1, 2
         |), l$d AS MATERIALIZED (
         |  SELECT x.seed, x.node, x.sigma, COALESCE(c.delta, 0) AS delta
         |  FROM d3 x LEFT JOIN c$d c ON c.seed = x.seed AND c.node = x.node
         |  WHERE x.dist = $d
         |)""".stripMargin
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |und AS (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |), e AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM und
       |  UNION ALL SELECT b, a FROM und
       |), f0 AS MATERIALIZED (
       |  SELECT seed, seed AS node, 0 AS dist, CAST(1 AS BIGINT) AS sigma
       |  FROM (SELECT DISTINCT src AS seed FROM e
       |        WHERE src % 97 = 0 ORDER BY seed LIMIT 32) s
       |), d0 AS MATERIALIZED (SELECT * FROM f0),
       |${(1 to 3).map(fwd).mkString(",\n")},
       |l3 AS MATERIALIZED (
       |  SELECT seed, node, sigma, CAST(0 AS HUGEINT) AS delta
       |  FROM d3 WHERE dist = 3
       |),
       |${(2 to 1 by -1).map(bwd).mkString(",\n")}
       |SELECT node, CAST(SUM(delta) AS BIGINT) AS bc_ppm
       |FROM (SELECT node, delta FROM l3
       |      UNION ALL SELECT node, delta FROM l2
       |      UNION ALL SELECT node, delta FROM l1) t
       |GROUP BY node ORDER BY bc_ppm DESC, node LIMIT 500""".stripMargin
  }

  /** R134: eigenvector centrality (see
    * [[graft.operators.Graph.eigenvectorCentrality]]) over the
    * co-purchase graph, 3 normalized power-iteration rounds, top 500 —
    * which parts sit at the hub of the hub parts.
    */
  def graphEigenvector(s: SparkSession, dir: String): DataFrame =
    // staged directed table (r9, the graphPagerank rationale)
    graft.operators.Graph.eigenvectorCentralityOnDir(
        QueriesR6.coPurchaseDir(s, dir), iterations = 3)
      .orderBy(col("ev_ppm").desc, col("node"))
      .limit(500)

  /** X33: streaming log-rank monitor (see
    * [[graft.streaming.Streams.streamingLogRank]]) — R132 maintained
    * from one long of state per (group, time, side, event) cell; same
    * input, same oracle as `q_logrank`.
    */
  def streamLogrank(s: SparkSession, dir: String): DataFrame = {
    val rows = t(s, dir, "orders")
      .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderstatus"), col("o_orderdate"))
      .agg(max(col("l_shipdate")).as("last_ship"))
      .select(year(col("o_orderdate").cast("date")).as("grp"),
        (col("o_orderpriority") <= "2").as("s"),
        expr("""greatest(datediff(CAST(last_ship AS DATE),
               |CAST(o_orderdate AS DATE)), 0) div 7""".stripMargin)
          .cast("long").as("t"),
        (col("o_orderstatus") === "F").as("obs"))
    graft.streaming.Streams.streamingLogRank(s, rows,
        queryName = s"gate_slogrank_${System.nanoTime()}")
      .orderBy(col("grp"))
  }

  /** R134 oracle: 3 chained power-iteration CTEs, each normalizing by
    * the round's global max via a scalar cross join.
    */
  private val eigenvectorSql: String = {
    def round(r: Int): String =
      s"""r$r AS (
         |  SELECT e.dst AS node, SUM(x.x) AS r
         |  FROM e JOIN x${r - 1} x ON x.node = e.src
         |  GROUP BY e.dst
         |), x$r AS (
         |  SELECT node, r * 1000000 // (SELECT MAX(r) FROM r$r) AS x
         |  FROM r$r
         |)""".stripMargin
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |und AS (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |), e AS (
       |  SELECT a AS src, b AS dst FROM und
       |  UNION ALL SELECT b, a FROM und
       |), x0 AS (
       |  SELECT DISTINCT src AS node, CAST(1000000 AS HUGEINT) AS x FROM e
       |),
       |${(1 to 3).map(round).mkString(",\n")}
       |SELECT node, CAST(x AS BIGINT) AS ev_ppm FROM x3
       |ORDER BY ev_ppm DESC, node LIMIT 500""".stripMargin
  }

  /** R135: degree assortativity (see
    * [[graft.operators.Graph.assortativity]]) of the co-purchase graph
    * — one exact global number: do popular parts co-sell with popular
    * parts?
    */
  def graphAssortativity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.assortativity(
      QueriesR6.coPurchaseEdges(s, dir))

  /** R136: modularity report (see
    * [[graft.operators.Graph.modularity]]) of R72's label-propagation
    * communities over the co-purchase graph — did the clustering find
    * real structure, per community in exact ppm.
    */
  def graphModularity(s: SparkSession, dir: String): DataFrame = {
    val edges = QueriesR6.coPurchaseEdges(s, dir)
    // labels off the staged directed table (r9; identical labels)
    val labels = graft.operators.Graph.labelPropagationOnDir(
      QueriesR6.coPurchaseDir(s, dir), iterations = 3)
    graft.operators.Graph.modularity(edges, labels)
      .orderBy(col("lbl"))
  }

  private val assortativitySql: String =
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
      |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1
      |), jk AS (
      |  SELECT d1.deg AS j, d2.deg AS k
      |  FROM e JOIN deg d1 ON d1.src = e.src JOIN deg d2 ON d2.src = e.dst
      |), a AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
      |    SUM(CAST(j AS HUGEINT) * k) AS sjk,
      |    CAST(SUM(j) AS BIGINT) AS sj,
      |    SUM(CAST(j AS HUGEINT) * j) AS sj2
      |  FROM jk
      |)
      |SELECT m AS m_directed,
      |  CASE WHEN m * sj2 - CAST(sj AS HUGEINT) * sj = 0 THEN NULL
      |    WHEN m * sjk - CAST(sj AS HUGEINT) * sj < 0 THEN
      |      -CAST(-(m * sjk - CAST(sj AS HUGEINT) * sj) * 1000000
      |        // (m * sj2 - CAST(sj AS HUGEINT) * sj) AS BIGINT)
      |    ELSE CAST((m * sjk - CAST(sj AS HUGEINT) * sj) * 1000000
      |        // (m * sj2 - CAST(sj AS HUGEINT) * sj) AS BIGINT)
      |  END AS assortativity_ppm
      |FROM a""".stripMargin

  private def modularitySql: String =
    s"""WITH labels AS (
       |  SELECT * FROM (
       |${QueriesR6.sql("graph_labelprop")}
       |  ) t
       |), li2 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |und2 AS (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM li2 a JOIN li2 b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |), mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und2),
       |deg AS (
       |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
       |  FROM (SELECT a AS node FROM und2
       |        UNION ALL SELECT b AS node FROM und2) t
       |  GROUP BY 1
       |), ec AS (
       |  SELECT la.lbl, CAST(COUNT(*) AS BIGINT) AS e_intra
       |  FROM und2 u
       |  JOIN labels la ON la.node = u.a
       |  JOIN labels lb ON lb.node = u.b
       |  WHERE la.lbl = lb.lbl
       |  GROUP BY 1
       |), dc AS (
       |  SELECT l.lbl, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |    CAST(SUM(d.deg) AS BIGINT) AS deg_total
       |  FROM labels l JOIN deg d ON d.node = l.node
       |  GROUP BY 1
       |)
       |SELECT dc.lbl, dc.n_nodes, COALESCE(ec.e_intra, 0) AS e_intra,
       |  dc.deg_total,
       |  CASE WHEN 4 * CAST(mm.m AS HUGEINT) * COALESCE(ec.e_intra, 0)
       |         - CAST(dc.deg_total AS HUGEINT) * dc.deg_total < 0 THEN
       |    -CAST(-(4 * CAST(mm.m AS HUGEINT) * COALESCE(ec.e_intra, 0)
       |        - CAST(dc.deg_total AS HUGEINT) * dc.deg_total) * 1000000
       |      // (4 * CAST(mm.m AS HUGEINT) * mm.m) AS BIGINT)
       |  ELSE
       |    CAST((4 * CAST(mm.m AS HUGEINT) * COALESCE(ec.e_intra, 0)
       |        - CAST(dc.deg_total AS HUGEINT) * dc.deg_total) * 1000000
       |      // (4 * CAST(mm.m AS HUGEINT) * mm.m) AS BIGINT)
       |  END AS contrib_ppm
       |FROM dc LEFT JOIN ec ON ec.lbl = dc.lbl CROSS JOIN mm
       |ORDER BY dc.lbl""".stripMargin

  // ---------------------------------------------------------------- oracle

  private val sqlBase: Map[String, String] = Map(
    "graph_betweenness" -> betweennessSql,
    "graph_eigenvector" -> eigenvectorSql,
    "graph_assortativity" -> assortativitySql,
    "graph_modularity" -> modularitySql,
    "q_holt_trend" ->
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
        |  SELECT user_id, event_id, ts_sec, x, rn,
        |    x * 1000 AS l, CAST(0 AS BIGINT) AS b
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.event_id, r.ts_sec, r.x, r.rn,
        |    (200000 * r.x * 1000 + 800000 * (rec.l + rec.b)) // 1000000
        |      AS l,
        |    (100000 * ((200000 * r.x * 1000 + 800000 * (rec.l + rec.b))
        |        // 1000000 - rec.l)
        |      + 900000 * rec.b) // 1000000 AS b
        |  FROM r JOIN rec ON r.user_id = rec.user_id AND r.rn = rec.rn + 1
        |)
        |SELECT user_id, event_id, ts_sec, x,
        |  CAST(l AS BIGINT) AS level_milli, CAST(b AS BIGINT) AS trend_milli,
        |  CAST(l + b AS BIGINT) AS forecast_milli
        |FROM rec ORDER BY user_id, event_id""".stripMargin,
    "q_autocorr" ->
      """WITH e AS (
        |  SELECT event_type AS grp,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS x
        |  FROM events
        |), r AS (
        |  SELECT grp, x,
        |    ROW_NUMBER() OVER (PARTITION BY grp
        |      ORDER BY ts_sec, event_id) AS t,
        |    CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n,
        |    CAST(SUM(x) OVER (PARTITION BY grp) AS BIGINT) AS s
        |  FROM e
        |), den AS (
        |  SELECT grp, MAX(n) AS n,
        |    SUM((CAST(n AS HUGEINT) * x - s) * (CAST(n AS HUGEINT) * x - s))
        |      AS d
        |  FROM r GROUP BY 1
        |), lags AS (SELECT unnest([1, 7]) AS lag),
        |num AS (
        |  SELECT c.grp, l.lag,
        |    SUM((CAST(c.n AS HUGEINT) * c.x - c.s)
        |      * (CAST(p.n AS HUGEINT) * p.x - p.s)) AS nm
        |  FROM r c CROSS JOIN lags l
        |  JOIN r p ON p.grp = c.grp AND p.t = c.t - l.lag
        |  GROUP BY 1, 2
        |)
        |SELECT d.grp, CAST(l.lag AS BIGINT) AS lag, d.n,
        |  CASE WHEN d.d = 0 OR d.n <= l.lag OR nm IS NULL THEN NULL
        |    WHEN nm < 0 THEN -CAST((-nm) * 1000000 // d.d AS BIGINT)
        |    ELSE CAST(nm * 1000000 // d.d AS BIGINT) END AS acf_ppm
        |FROM den d CROSS JOIN lags l
        |LEFT JOIN num ON num.grp = d.grp AND num.lag = l.lag
        |ORDER BY d.grp, lag""".stripMargin,
    "q_logrank" ->
      """WITH subj AS (
        |  SELECT year(CAST(o.o_orderdate AS DATE)) AS grp,
        |    (o.o_orderpriority <= '2') AS s,
        |    GREATEST(datediff('day', CAST(o.o_orderdate AS DATE),
        |      CAST(MAX(l.l_shipdate) AS DATE)), 0) // 7 AS t,
        |    (o.o_orderstatus = 'F') AS obs
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderstatus,
        |    o.o_orderdate
        |), grid AS (
        |  SELECT grp, t, CAST(COUNT(*) AS BIGINT) AS arr,
        |    CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS arr_a,
        |    CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(SUM(CASE WHEN s AND obs THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d_a
        |  FROM subj GROUP BY 1, 2
        |), risk AS (
        |  SELECT grp, t, d, d_a,
        |    SUM(arr) OVER (PARTITION BY grp ORDER BY t DESC) AS n,
        |    SUM(arr_a) OVER (PARTITION BY grp ORDER BY t DESC) AS n_a
        |  FROM grid
        |), ev AS (
        |  SELECT grp, d_a,
        |    CAST(d AS HUGEINT) * n_a * 1000000 // n AS e_micro,
        |    CASE WHEN n <= 1 THEN CAST(0 AS HUGEINT)
        |      ELSE CAST(d AS HUGEINT) * n_a * (n - n_a) * (n - d) * 1000000
        |        // (CAST(n AS HUGEINT) * n * (n - 1)) END AS v_micro
        |  FROM risk WHERE d >= 1
        |), tot AS (
        |  SELECT grp,
        |    CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN s THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM subj GROUP BY 1
        |), agg AS (
        |  SELECT grp, CAST(SUM(d_a) AS BIGINT) AS o_a,
        |    SUM(e_micro) AS e, SUM(v_micro) AS v
        |  FROM ev GROUP BY 1
        |)
        |SELECT CAST(t.grp AS VARCHAR) AS grp, t.n_a, t.n_b,
        |  COALESCE(a.o_a, 0) AS o_a,
        |  CAST(COALESCE(a.e, 0) AS BIGINT) AS e_a_micro,
        |  CAST(COALESCE(a.v, 0) AS BIGINT) AS v_micro,
        |  CASE WHEN COALESCE(a.v, 0) = 0 THEN NULL
        |    ELSE CAST((CAST(COALESCE(a.o_a, 0) AS HUGEINT) * 1000000 - a.e)
        |      * (CAST(COALESCE(a.o_a, 0) AS HUGEINT) * 1000000 - a.e)
        |      * 1000 // (a.v * 1000000) AS BIGINT) END AS chi2_milli
        |FROM tot t LEFT JOIN agg a ON t.grp = a.grp
        |ORDER BY grp""".stripMargin,
    "dedup_containment" ->
      """WITH g0 AS (
        |  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS tok
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i
        |        FROM (SELECT doc_id, str_split(text, ' ') AS ts
        |              FROM documents) d) t
        |), tok AS (SELECT DISTINCT doc_id, tok FROM g0 WHERE tok <> ''),
        |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM tok GROUP BY 1),
        |pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n_inter
        |  FROM tok x JOIN tok y ON x.tok = y.tok AND x.doc_id <> y.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b, sa.n AS n_a, sb.n AS n_b, p.n_inter,
        |  CAST(p.n_inter * 1000000 // sa.n AS BIGINT) AS containment_ppm
        |FROM pairs p
        |JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
        |WHERE p.n_inter * 1000000 // sa.n >= 800000
        |ORDER BY a, b""".stripMargin,
    "q_quantile_shift" ->
      """WITH e AS (
        |  SELECT l_linestatus AS grp, (l_returnflag = 'R') AS s,
        |    CAST(l_quantity AS BIGINT) AS v
        |  FROM lineitem
        |), grid AS (
        |  SELECT grp, v,
        |    CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(SUM(CASE WHEN s THEN 0 ELSE 1 END) AS BIGINT) AS c_b
        |  FROM e GROUP BY 1, 2
        |), c AS (
        |  SELECT grp, v,
        |    SUM(c_a) OVER (PARTITION BY grp ORDER BY v) AS cum_a,
        |    SUM(c_b) OVER (PARTITION BY grp ORDER BY v) AS cum_b,
        |    SUM(c_a) OVER (PARTITION BY grp) AS n_a,
        |    SUM(c_b) OVER (PARTITION BY grp) AS n_b
        |  FROM grid
        |), px AS (
        |  SELECT c.*, p.p_ppm
        |  FROM c CROSS JOIN
        |    (SELECT unnest([250000, 500000, 900000, 990000]) AS p_ppm) p
        |), a AS (
        |  SELECT grp, CAST(p_ppm AS BIGINT) AS p_ppm,
        |    CAST(MAX(n_a) AS BIGINT) AS n_a,
        |    CAST(MAX(n_b) AS BIGINT) AS n_b,
        |    CAST(MIN(CASE WHEN cum_a * 1000000 >= p_ppm * n_a THEN v END)
        |      AS BIGINT) AS qa,
        |    CAST(MIN(CASE WHEN cum_b * 1000000 >= p_ppm * n_b THEN v END)
        |      AS BIGINT) AS qb
        |  FROM px GROUP BY 1, 2
        |)
        |SELECT grp, p_ppm, n_a, n_b,
        |  CASE WHEN n_a = 0 THEN NULL ELSE qa END AS v_a,
        |  CASE WHEN n_b = 0 THEN NULL ELSE qb END AS v_b,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE qa - qb END AS shift
        |FROM a ORDER BY grp, p_ppm""".stripMargin,
    "q_ks_test" ->
      """WITH e AS (
        |  SELECT l_linestatus AS grp, (l_returnflag = 'R') AS s,
        |    CAST(l_quantity AS BIGINT) AS v
        |  FROM lineitem
        |), grid AS (
        |  SELECT grp, v,
        |    CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(SUM(CASE WHEN s THEN 0 ELSE 1 END) AS BIGINT) AS c_b
        |  FROM e GROUP BY 1, 2
        |), c AS (
        |  SELECT grp, v,
        |    SUM(c_a) OVER (PARTITION BY grp ORDER BY v) AS cum_a,
        |    SUM(c_b) OVER (PARTITION BY grp ORDER BY v) AS cum_b,
        |    SUM(c_a) OVER (PARTITION BY grp) AS n_a,
        |    SUM(c_b) OVER (PARTITION BY grp) AS n_b
        |  FROM grid
        |), gaps AS (
        |  SELECT grp, v, n_a, n_b,
        |    ABS(CAST(cum_a AS HUGEINT) * n_b
        |      - CAST(cum_b AS HUGEINT) * n_a) AS gap
        |  FROM c
        |), mx AS (
        |  SELECT grp, CAST(MAX(n_a) AS BIGINT) AS n_a,
        |    CAST(MAX(n_b) AS BIGINT) AS n_b, MAX(gap) AS m
        |  FROM gaps GROUP BY 1
        |)
        |SELECT m.grp, m.n_a, m.n_b,
        |  CAST(m.m * 1000000
        |    // NULLIF(CAST(m.n_a AS HUGEINT) * m.n_b, 0) AS BIGINT)
        |    AS ks_ppm,
        |  CASE WHEN m.n_a = 0 OR m.n_b = 0 THEN NULL
        |    ELSE (SELECT CAST(MIN(g.v) AS BIGINT) FROM gaps g
        |          WHERE g.grp = m.grp AND g.gap = m.m) END AS ks_at
        |FROM mx m ORDER BY grp""".stripMargin,
    "q_wasserstein" ->
      """WITH e AS (
        |  SELECT l_linestatus AS grp, (l_returnflag = 'R') AS s,
        |    CAST(ROUND(l_discount * 100) AS BIGINT) AS v
        |  FROM lineitem
        |), grid AS (
        |  SELECT grp, v,
        |    CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(SUM(CASE WHEN s THEN 0 ELSE 1 END) AS BIGINT) AS c_b
        |  FROM e GROUP BY 1, 2
        |), c AS (
        |  SELECT grp, v,
        |    SUM(c_a) OVER (PARTITION BY grp ORDER BY v) AS cum_a,
        |    SUM(c_b) OVER (PARTITION BY grp ORDER BY v) AS cum_b,
        |    SUM(c_a) OVER (PARTITION BY grp) AS n_a,
        |    SUM(c_b) OVER (PARTITION BY grp) AS n_b,
        |    COALESCE(LEAD(v) OVER (PARTITION BY grp ORDER BY v) - v, 0)
        |      AS gp
        |  FROM grid
        |), agg AS (
        |  SELECT grp, CAST(MAX(n_a) AS BIGINT) AS n_a,
        |    CAST(MAX(n_b) AS BIGINT) AS n_b,
        |    SUM(ABS(CAST(cum_a AS HUGEINT) * n_b
        |      - CAST(cum_b AS HUGEINT) * n_a) * gp) AS num
        |  FROM c GROUP BY 1
        |)
        |SELECT grp, n_a, n_b,
        |  CAST(num * 1000
        |    // NULLIF(CAST(n_a AS HUGEINT) * n_b, 0) AS BIGINT) AS w1_milli
        |FROM agg ORDER BY grp""".stripMargin,
    "q_cramers_v" ->
      """WITH e AS (
        |  SELECT c_mktsegment AS grp, o_orderpriority AS av,
        |    o_orderstatus AS bv
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), cells AS (
        |  SELECT grp, av, bv, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM e GROUP BY 1, 2, 3
        |), rmarg AS (
        |  SELECT grp, av, CAST(SUM(o) AS BIGINT) AS ra
        |  FROM cells GROUP BY 1, 2
        |), cmarg AS (
        |  SELECT grp, bv, CAST(SUM(o) AS BIGINT) AS cb
        |  FROM cells GROUP BY 1, 2
        |), tot AS (
        |  SELECT grp, CAST(SUM(o) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT av) AS BIGINT) AS n_rows,
        |    CAST(COUNT(DISTINCT bv) AS BIGINT) AS n_cols
        |  FROM cells GROUP BY 1
        |), fl AS (
        |  SELECT r.grp, r.av, c.bv, r.ra, c.cb, COALESCE(x.o, 0) AS o
        |  FROM rmarg r JOIN cmarg c ON r.grp = c.grp
        |  LEFT JOIN cells x
        |    ON x.grp = r.grp AND x.av = r.av AND x.bv = c.bv
        |), terms AS (
        |  SELECT f.grp, t.n, t.n_rows, t.n_cols,
        |    (CAST(f.o AS HUGEINT) * t.n - CAST(f.ra AS HUGEINT) * f.cb)
        |      * (CAST(f.o AS HUGEINT) * t.n - CAST(f.ra AS HUGEINT) * f.cb)
        |      * 1000
        |      // (CAST(t.n AS HUGEINT) * f.ra * f.cb) AS trm
        |  FROM fl f JOIN tot t ON f.grp = t.grp
        |), s AS (
        |  SELECT grp, MAX(n) AS n, MAX(n_rows) AS n_rows,
        |    MAX(n_cols) AS n_cols, CAST(SUM(trm) AS BIGINT) AS chi2_milli
        |  FROM terms GROUP BY 1
        |)
        |SELECT grp, n, n_rows, n_cols, chi2_milli,
        |  CASE WHEN LEAST(n_rows, n_cols) < 2 THEN NULL
        |    ELSE CAST(CAST(chi2_milli AS HUGEINT) * 1000
        |      // (CAST(n AS HUGEINT) * (LEAST(n_rows, n_cols) - 1))
        |      AS BIGINT) END AS v2_ppm
        |FROM s ORDER BY grp""".stripMargin,
    "q_abc_class" ->
      """WITH rev AS (
        |  SELECT c_mktsegment AS grp, c_custkey AS id,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT grp, x,
        |    SUM(x) OVER (PARTITION BY grp ORDER BY x DESC, id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(x) OVER (PARTITION BY grp) AS t
        |  FROM rev
        |), cls AS (
        |  SELECT grp,
        |    CASE WHEN CAST(cum - x AS HUGEINT) * 1000000
        |           < CAST(700000 AS HUGEINT) * t THEN 'A'
        |         WHEN CAST(cum - x AS HUGEINT) * 1000000
        |           < CAST(900000 AS HUGEINT) * t THEN 'B'
        |         ELSE 'C' END AS abc_class,
        |    x, t
        |  FROM c
        |)
        |SELECT grp, abc_class, CAST(COUNT(*) AS BIGINT) AS n_entities,
        |  CAST(SUM(x) AS BIGINT) AS mass,
        |  CAST(CAST(SUM(x) AS HUGEINT) * 1000000
        |    // NULLIF(MAX(t), 0) AS BIGINT) AS share_ppm
        |FROM cls GROUP BY 1, 2 ORDER BY grp, abc_class""".stripMargin,
    "dedup_setsim_exact" ->
      """WITH g0 AS (
        |  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS tok
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i
        |        FROM (SELECT doc_id, str_split(text, ' ') AS ts
        |              FROM documents) d) t
        |), tok AS (SELECT DISTINCT doc_id, tok FROM g0 WHERE tok <> ''),
        |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM tok GROUP BY 1),
        |pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n_inter
        |  FROM tok x JOIN tok y ON x.tok = y.tok AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b, sa.n AS n_a, sb.n AS n_b, p.n_inter,
        |  CAST(p.n_inter * 1000000 // (sa.n + sb.n - p.n_inter) AS BIGINT)
        |    AS jaccard_ppm
        |FROM pairs p
        |JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
        |WHERE p.n_inter * 1000000 // (sa.n + sb.n - p.n_inter) >= 500000
        |ORDER BY a, b""".stripMargin,
    "q_survival_km" ->
      """WITH RECURSIVE subj AS (
        |  SELECT o.o_orderpriority AS grp,
        |    GREATEST(datediff('day', CAST(o.o_orderdate AS DATE),
        |      CAST(MAX(l.l_shipdate) AS DATE)), 0) // 7 AS t,
        |    (o.o_orderstatus = 'F') AS obs
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderstatus,
        |    o.o_orderdate
        |), grid AS (
        |  SELECT grp, CAST(t AS BIGINT) AS t,
        |    CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(SUM(CASE WHEN obs THEN 0 ELSE 1 END) AS BIGINT) AS c
        |  FROM subj GROUP BY 1, 2
        |), risk AS (
        |  SELECT grp, t, d, c,
        |    SUM(d + c) OVER (PARTITION BY grp ORDER BY t DESC) AS n_risk,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY t) AS rn
        |  FROM grid
        |), rec AS (
        |  SELECT grp, t, n_risk, d, c, rn,
        |    (1000000 * (n_risk - d)) // n_risk AS sp
        |  FROM risk WHERE rn = 1
        |  UNION ALL
        |  SELECT r.grp, r.t, r.n_risk, r.d, r.c, r.rn,
        |    (rec.sp * (r.n_risk - r.d)) // r.n_risk
        |  FROM risk r JOIN rec ON r.grp = rec.grp AND r.rn = rec.rn + 1
        |)
        |SELECT grp, t, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
        |  c AS n_censored, CAST(sp AS BIGINT) AS surv_ppm
        |FROM rec ORDER BY grp, t""".stripMargin,
    "graph_ppr" ->
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
        |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src
        |), seeds AS (
        |  SELECT DISTINCT p_partkey AS node FROM part WHERE p_size = 50
        |), univ AS (
        |  SELECT src AS node FROM deg UNION SELECT node FROM seeds
        |), sd AS (
        |  SELECT u.node, CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed
        |  FROM univ u LEFT JOIN seeds s ON u.node = s.node
        |), p0 AS (
        |  SELECT node, CAST(is_seed AS HUGEINT) * 1000000 AS pr FROM sd
        |), s1 AS (
        |  SELECT e.dst AS node, SUM(p.pr // d.deg) AS s
        |  FROM e JOIN p0 p ON p.node = e.src JOIN deg d ON d.src = e.src
        |  GROUP BY e.dst
        |), p1 AS (
        |  SELECT sd.node, sd.is_seed * 150000
        |    + CAST(850000 AS HUGEINT) * COALESCE(s1.s, 0) // 1000000 AS pr
        |  FROM sd LEFT JOIN s1 ON sd.node = s1.node
        |), s2 AS (
        |  SELECT e.dst AS node, SUM(p.pr // d.deg) AS s
        |  FROM e JOIN p1 p ON p.node = e.src JOIN deg d ON d.src = e.src
        |  GROUP BY e.dst
        |), p2 AS (
        |  SELECT sd.node, sd.is_seed * 150000
        |    + CAST(850000 AS HUGEINT) * COALESCE(s2.s, 0) // 1000000 AS pr
        |  FROM sd LEFT JOIN s2 ON sd.node = s2.node
        |), s3 AS (
        |  SELECT e.dst AS node, SUM(p.pr // d.deg) AS s
        |  FROM e JOIN p2 p ON p.node = e.src JOIN deg d ON d.src = e.src
        |  GROUP BY e.dst
        |), p3 AS (
        |  SELECT sd.node, sd.is_seed * 150000
        |    + CAST(850000 AS HUGEINT) * COALESCE(s3.s, 0) // 1000000 AS pr
        |  FROM sd LEFT JOIN s3 ON sd.node = s3.node
        |)
        |SELECT node, CAST(pr AS BIGINT) AS ppr_ppm FROM p3
        |ORDER BY ppr_ppm DESC, node LIMIT 500""".stripMargin,
    "q_mannwhitney" ->
      """WITH e AS (
        |  SELECT l_linestatus AS grp, (l_returnflag = 'R') AS s,
        |    CAST(l_quantity AS BIGINT) AS v
        |  FROM lineitem
        |), grid AS (
        |  SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a
        |  FROM e GROUP BY 1, 2
        |), rk AS (
        |  SELECT grp, v, cnt, cnt_a,
        |    COALESCE(SUM(cnt) OVER (PARTITION BY grp ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      AS rmin
        |  FROM grid
        |), a AS (
        |  SELECT grp, CAST(SUM(cnt_a) AS BIGINT) AS n_a,
        |    CAST(SUM(cnt - cnt_a) AS BIGINT) AS n_b,
        |    CAST(SUM(cnt_a * (2 * rmin + cnt - 1)) AS BIGINT) AS r2_a
        |  FROM rk GROUP BY 1
        |)
        |SELECT grp, n_a, n_b, r2_a - n_a * (n_a + 1) AS u2_a,
        |  2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b,
        |  CAST((r2_a - n_a * (n_a + 1)) * 1000000
        |    // NULLIF(2 * n_a * n_b, 0) AS BIGINT) AS auc_a_ppm
        |FROM a ORDER BY grp""".stripMargin,
    "q_gini_coeff" ->
      """WITH rev AS (
        |  SELECT c_mktsegment AS grp, c_custkey AS id,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2
        |), rk AS (
        |  SELECT grp, x,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x, id) AS i
        |  FROM rev
        |), a AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS total,
        |    SUM(CAST(i AS HUGEINT) * x) AS ix
        |  FROM rk GROUP BY 1
        |)
        |SELECT grp, n, total,
        |  CAST((2 * ix - CAST(n + 1 AS HUGEINT) * total) * 1000000
        |    // (CAST(n AS HUGEINT) * NULLIF(total, 0)) AS BIGINT) AS gini_ppm
        |FROM a ORDER BY grp""".stripMargin,
    "q_drift_tv" ->
      """WITH e AS (
        |  SELECT c_mktsegment AS grp, o_orderpriority AS cat,
        |    (CAST(o_orderdate AS DATE) < DATE '1995-01-01') AS s
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), cells AS (
        |  SELECT grp, cat,
        |    CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(SUM(CASE WHEN s THEN 0 ELSE 1 END) AS BIGINT) AS c_b
        |  FROM e GROUP BY 1, 2
        |), tot AS (
        |  SELECT grp, CAST(SUM(c_a) AS BIGINT) AS n_a,
        |    CAST(SUM(c_b) AS BIGINT) AS n_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_categories
        |  FROM cells GROUP BY 1
        |)
        |SELECT t.grp, t.n_a, t.n_b, t.n_categories,
        |  CAST(x.num * 1000000
        |    // NULLIF(2 * CAST(t.n_a AS HUGEINT) * t.n_b, 0) AS BIGINT)
        |    AS tv_ppm
        |FROM tot t JOIN (
        |  SELECT c.grp,
        |    SUM(ABS(CAST(c.c_a AS HUGEINT) * t2.n_b
        |      - CAST(c.c_b AS HUGEINT) * t2.n_a)) AS num
        |  FROM cells c JOIN tot t2 ON c.grp = t2.grp GROUP BY 1) x
        |  ON t.grp = x.grp
        |ORDER BY t.grp""".stripMargin,
    "q_spearman" ->
      """WITH e AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
        |    datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
        |      AS y,
        |    o_orderkey AS id
        |  FROM orders
        |), rk AS (
        |  SELECT grp,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x, id) AS rx,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY y, id) AS ry
        |  FROM e
        |), a AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(rx - ry AS HUGEINT) * (rx - ry)) AS d2
        |  FROM rk GROUP BY 1
        |)
        |SELECT grp, n, CAST(d2 AS BIGINT) AS d2_sum,
        |  CASE WHEN n < 2 THEN NULL
        |    ELSE 1000000 - CAST(6 * d2 * 1000000
        |      // (CAST(n AS HUGEINT) * n * n - n) AS BIGINT)
        |  END AS rho_ppm
        |FROM a ORDER BY grp""".stripMargin)

  // X30–X33 share their batch twins' oracles verbatim: streaming ≡ batch
  val sql: Map[String, String] =
    sqlBase + ("stream_drift_tv" -> sqlBase("q_drift_tv")) +
      ("stream_quantile_shift" -> sqlBase("q_quantile_shift")) +
      ("stream_holt" -> sqlBase("q_holt_trend")) +
      ("stream_logrank" -> sqlBase("q_logrank"))
}
