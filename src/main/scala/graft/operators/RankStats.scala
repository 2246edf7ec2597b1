package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R120–R123: the rank-statistics kit — distribution-free comparison and
  * concentration measures an Oracle-replica analyst runs when means and
  * variances can't be trusted (skewed money columns, ordinal scores,
  * drifting mixes). Everything is integer-exact under the house ppm
  * contract: rank sums, cross-multiplied ratios and one final floor
  * division, so the DuckDB oracle reproduces every value bit-for-bit.
  *
  * Scale posture shared by all four: the data-sized work is hash
  * aggregation (to a value grid, a category grid, or per-entity totals);
  * windows run either over the bounded grid (Mann–Whitney: one row per
  * distinct value per group) or through [[Ranking.rankExact]]'s
  * two-stage rank (Gini, Spearman) — never a data-sized single-partition
  * sort.
  */
object RankStats {
  /** R120: Mann–Whitney U (Wilcoxon rank-sum) per group, exact under
    * ties via DOUBLED midranks — the classic "did treatment shift the
    * distribution" test without normality assumptions (Mann & Whitney
    * 1947). For value v with tie-run [rmin, rmin+cnt−1], the midrank is
    * (2·rmin + cnt − 1)/2 — a half-integer, so everything is carried
    * ×2: u2_a = 2·U_A = Σ_A (2·rmin + cnt − 1) − n_a·(n_a+1). The
    * common-language effect size U_A/(n_a·n_b) — exactly the AUC of
    * side A's values over side B's — lands in ppm as
    * auc_ppm = u2_a·10⁶ div (2·n_a·n_b), NULL when a side is empty.
    *
    * The rank machinery runs on the per-(group, value) GRID: one hash
    * aggregate to (grp, v, cnt, cnt_a), then a cumulative-count window
    * over distinct values only — use bounded-cardinality scores
    * (quantities, buckets, day counts); for continuous scores bucket
    * first or the grid degenerates to row count.
    *
    * @param df    input
    * @param group stratum key
    * @param side  true = sample A, false = sample B
    * @param value the compared score (cast to long)
    * @return (grp, n_a, n_b, u2_a, u2_b, auc_a_ppm) one row per group
    */
  def mannWhitneyU(df: DataFrame, group: Column, side: Column,
                   value: Column): DataFrame = {
    val grid = df
      .select(group.cast("string").as("grp"), side.cast("boolean").as("s"),
        value.cast("long").as("v"))
      .filter(col("v").isNotNull && col("s").isNotNull)
      .groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("s"), 1L).otherwise(0L)).as("cnt_a"))
    // rmin over the value grid only (≤ distinct values per group)
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grid
      .withColumn("rmin", coalesce(sum(col("cnt")).over(w), lit(0L)) + 1L)
      .groupBy(col("grp"))
      .agg(sum(col("cnt_a")).as("n_a"),
        sum(col("cnt") - col("cnt_a")).as("n_b"),
        sum(col("cnt_a") * (lit(2L) * col("rmin") + col("cnt") - 1L))
          .as("r2_a"))
      .select(col("grp"), col("n_a"), col("n_b"),
        (col("r2_a") - col("n_a") * (col("n_a") + 1L)).as("u2_a"))
      .withColumn("u2_b", lit(2L) * col("n_a") * col("n_b") - col("u2_a"))
      .withColumn("auc_a_ppm",
        expr("u2_a * 1000000 div nullif(2 * n_a * n_b, 0)"))
  }

  /** R121: Gini coefficient of a nonnegative quantity per group — the
    * inequality/concentration summary (revenue across customers, tokens
    * across sources) that complements R117's HHI with the Lorenz-curve
    * view. Closed form over values sorted ascending with rank i:
    *
    *   gini_ppm = (2·Σ i·xᵢ − (n+1)·Σx) · 10⁶ div (n · Σx)
    *
    * The numerator is nonnegative for ascending ranks (Chebyshev's sum
    * inequality), so floor and truncation agree. Ranks come from
    * [[Ranking.rankExact]] on (x, tieBreak) — the two-stage exact rank,
    * no data-sized single-partition sort; the oracle's ROW_NUMBER over
    * the same total order lands identical ranks. NULL for groups with
    * Σx = 0 (all-zero mass has no Lorenz curve).
    *
    * @param df    one row per entity
    * @param group stratum key (column name)
    * @param x     nonnegative mass per entity (cast to long)
    * @param tie   completes the (x, tie) total order
    * @return (grp, n, total, gini_ppm) one row per group
    */
  def giniCoefficient(df: DataFrame, group: String, x: Column,
                      tie: Column): DataFrame = {
    val base = df.select(col(group).cast("string").as("grp"),
        x.cast("long").as("x"), tie.as("tie"))
      .filter(col("x").isNotNull)
    Ranking.rankExact(base, Seq("grp"), col("x"), Seq(col("tie")), "i")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("total"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * x")).as("__ix"))
      .select(col("grp"), col("n"), col("total"),
        expr("""CAST((2 * __ix - CAST(n + 1 AS DECIMAL(38,0)) * total)
               | * 1000000 div (CAST(n AS DECIMAL(38,0))
               | * nullif(total, 0)) AS BIGINT)""".stripMargin)
          .as("gini_ppm"))
  }

  /** R122: total-variation distance between two categorical mixes per
    * group — the drift metric with an exact rational form (unlike KL or
    * PSI, whose logs never hash-match):
    *
    *   tv_ppm = Σ_cat |c_a·N_b − c_b·N_a| · 10⁶ div (2 · N_a · N_b)
    *
    * 0 = identical mix, 10⁶ = disjoint support. Categories missing from
    * one side enter with count 0 via the full category grid (one hash
    * aggregate — a category key never straddles groups). NULL when a
    * side is empty. The screen behind "did this quarter's order-priority
    * mix move": TV is the largest probability difference any event set
    * can see, so it thresholds cleanly.
    *
    * @param df       input
    * @param group    stratum key
    * @param category the distributed-over label
    * @param side     true = population A, false = population B
    * @return (grp, n_a, n_b, n_categories, tv_ppm) one row per group
    */
  def totalVariation(df: DataFrame, group: Column, category: Column,
                     side: Column): DataFrame = {
    val cells = df
      .select(group.cast("string").as("grp"),
        category.cast("string").as("cat"), side.cast("boolean").as("s"))
      .filter(col("s").isNotNull)
      .groupBy(col("grp"), col("cat"))
      .agg(sum(when(col("s"), 1L).otherwise(0L)).as("c_a"),
        sum(when(col("s"), 0L).otherwise(1L)).as("c_b"))
    tvFromCells(cells)
  }

  /** The TV tail from a pre-aggregated (grp, cat, c_a, c_b) cell table —
    * shared by [[totalVariation]] and the streaming monitor (X30), so
    * streaming ≡ batch is by construction.
    */
  def tvFromCells(cells: DataFrame): DataFrame = {
    // group totals are group-cardinality-sized — AQE broadcasts the join
    val totals = cells.groupBy(col("grp"))
      .agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
        count(lit(1)).as("n_categories"))
    cells.join(totals, Seq("grp"))
      .groupBy(col("grp"))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        first(col("n_categories")).as("n_categories"),
        sum(abs(expr("CAST(c_a AS DECIMAL(38,0)) * n_b")
          - expr("CAST(c_b AS DECIMAL(38,0)) * n_a"))).as("__num"))
      .select(col("grp"), col("n_a"), col("n_b"), col("n_categories"),
        expr("""CAST(__num * 1000000
               | div nullif(2 * CAST(n_a AS DECIMAL(38,0)) * n_b, 0)
               | AS BIGINT)""".stripMargin).as("tv_ppm"))
  }

  /** Shared grid for the two-sample distribution distances (R125/R127):
    * per (grp, v) the side counts plus cumulative counts and side totals
    * — windows run over DISTINCT values only, so bounded-cardinality
    * scores never pay a data-sized sort.
    */
  private def sampleGrid(df: DataFrame, group: Column, side: Column,
                         value: Column): DataFrame =
    gridCums(df
      .select(group.cast("string").as("grp"), side.cast("boolean").as("s"),
        value.cast("long").as("v"))
      .filter(col("v").isNotNull && col("s").isNotNull)
      .groupBy(col("grp"), col("v"))
      .agg(sum(when(col("s"), 1L).otherwise(0L)).as("c_a"),
        sum(when(col("s"), 0L).otherwise(1L)).as("c_b")))

  /** Cumulatives + side totals over a pre-aggregated (grp, v, c_a, c_b)
    * cell grid — shared by the batch paths and the streaming quantile
    * monitor (X31), so streaming ≡ batch is by construction.
    */
  private[graft] def gridCums(grid: DataFrame): DataFrame = {
    val wCum = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("grp"))
    grid
      .withColumn("cum_a", sum(col("c_a")).over(wCum))
      .withColumn("cum_b", sum(col("c_b")).over(wCum))
      .withColumn("n_a", sum(col("c_a")).over(wTot))
      .withColumn("n_b", sum(col("c_b")).over(wTot))
  }

  /** R125: two-sample Kolmogorov–Smirnov statistic per group — the
    * sup-norm companion of R122's TV for ORDERED domains: the largest
    * gap between the two empirical CDFs, exact by cross-multiplication:
    *
    *   ks_ppm = max_v |cum_a(v)·N_b − cum_b(v)·N_a| · 10⁶ div (N_a·N_b)
    *
    * plus ks_at, the smallest value attaining the max (where the
    * distributions diverge most — the actionable part of the report).
    * NULL when a side is empty. Same value-grid contract as R120: use
    * bounded-cardinality scores.
    *
    * @return (grp, n_a, n_b, ks_ppm, ks_at) one row per group
    */
  def ksDistance(df: DataFrame, group: Column, side: Column,
                 value: Column): DataFrame = {
    val g = sampleGrid(df, group, side, value)
      .withColumn("__gap", abs(expr("CAST(cum_a AS DECIMAL(38,0)) * n_b")
        - expr("CAST(cum_b AS DECIMAL(38,0)) * n_a")))
      // per-group max via a second grid-sized window, so the argmin-v
      // filter below stays a plain aggregate
      .withColumn("__mxw",
        max(col("__gap")).over(Window.partitionBy(col("grp"))))
    g.groupBy(col("grp"))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        max(col("__gap")).as("__mx"),
        min(when(col("__gap") === col("__mxw"), col("v"))).as("ks_at"))
      .select(col("grp"), col("n_a"), col("n_b"),
        expr("""CAST(__mx * 1000000
               | div nullif(CAST(n_a AS DECIMAL(38,0)) * n_b, 0)
               | AS BIGINT)""".stripMargin).as("ks_ppm"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(null))
          .otherwise(col("ks_at")).as("ks_at"))
  }

  /** R127: 1-D Wasserstein (earth-mover) distance per group — the
    * magnitude-weighted member of the drift suite (TV counts mass moved,
    * KS the worst gap, W1 how FAR mass must travel):
    *
    *   W1 = ∫ |F_a − F_b| dv  =  Σ_grid |cumdiff(vᵢ)| · (vᵢ₊₁ − vᵢ)
    *
    * reported ×1000 in the value's own units (milli-units), exact:
    * w1_milli = Σ |cum_a·N_b − cum_b·N_a|·gap·1000 div (N_a·N_b). NULL
    * when a side is empty. Value-grid contract as R125.
    *
    * @return (grp, n_a, n_b, w1_milli) one row per group
    */
  def wasserstein1(df: DataFrame, group: Column, side: Column,
                   value: Column): DataFrame = {
    val wNext = Window.partitionBy(col("grp")).orderBy(col("v"))
    sampleGrid(df, group, side, value)
      .withColumn("__gap", coalesce(lead(col("v"), 1).over(wNext) - col("v"),
        lit(0L)))
      .groupBy(col("grp"))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        sum(abs(expr("CAST(cum_a AS DECIMAL(38,0)) * n_b")
          - expr("CAST(cum_b AS DECIMAL(38,0)) * n_a")) * col("__gap"))
          .as("__num"))
      .select(col("grp"), col("n_a"), col("n_b"),
        expr("""CAST(__num * 1000
               | div nullif(CAST(n_a AS DECIMAL(38,0)) * n_b, 0)
               | AS BIGINT)""".stripMargin).as("w1_milli"))
  }

  /** R129: two-sample quantile-shift report per group — the latency- /
    * spend-regression screen: at each requested probability p, the
    * exact type-1 (lower) quantile of BOTH sides and the shift between
    * them. Type-1 keeps everything integer: the p-quantile is the
    * smallest grid value whose cumulative count reaches ⌈p·N/10⁶⌉,
    * tested as cum·10⁶ ≥ p·N (integers, no rounding anywhere — where
    * interpolated quantiles (R17) answer "what is the level", this
    * answers "did the distribution MOVE and by how much"). Empty side →
    * NULL quantile and shift. Value-grid contract as R125.
    *
    * @param ps probabilities in ppm (e.g. 500000 = median)
    * @return (grp, p_ppm, n_a, n_b, v_a, v_b, shift) one row per
    *         (group, probability)
    */
  def quantileShift(df: DataFrame, group: Column, side: Column,
                    value: Column, ps: Seq[Long]): DataFrame =
    quantileShiftFromCells(df
      .select(group.cast("string").as("grp"), side.cast("boolean").as("s"),
        value.cast("long").as("v"))
      .filter(col("v").isNotNull && col("s").isNotNull)
      .groupBy(col("grp"), col("v"))
      .agg(sum(when(col("s"), 1L).otherwise(0L)).as("c_a"),
        sum(when(col("s"), 0L).otherwise(1L)).as("c_b")), ps)

  /** The quantile-shift tail from a pre-aggregated (grp, v, c_a, c_b)
    * cell grid — shared with the streaming monitor (X31).
    */
  def quantileShiftFromCells(cells: DataFrame, ps: Seq[Long]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 1000000),
      s"probabilities out of (0, 10^6]: $ps")
    gridCums(cells)
      .withColumn("p_ppm", explode(array(ps.map(lit): _*)))
      .groupBy(col("grp"), col("p_ppm"))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        min(when(expr("cum_a * 1000000 >= p_ppm * n_a"), col("v")))
          .as("__qa"),
        min(when(expr("cum_b * 1000000 >= p_ppm * n_b"), col("v")))
          .as("__qb"))
      .select(col("grp"), col("p_ppm"), col("n_a"), col("n_b"),
        when(col("n_a") === 0, lit(null)).otherwise(col("__qa")).as("v_a"),
        when(col("n_b") === 0, lit(null)).otherwise(col("__qb")).as("v_b"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(null))
          .otherwise(col("__qa") - col("__qb")).as("shift"))
  }

  /** R126: general r×c chi-square association with Cramér's V² per
    * group — R115b's 2×2 test generalized to full contingency tables.
    * Exactness contract: per-CELL floor division (the EWMA posture —
    * a stated truncation both engines replay identically), cells taken
    * from the FULL cross product of observed row/col margins so zero
    * cells still contribute their expectation:
    *
    *   chi2_milli = Σ_cells (o·n − rₐ·c_b)² · 1000 div (n·rₐ·c_b)
    *   v2_ppm     = chi2_milli · 1000 div (n · (min(r,c) − 1))
    *
    * V² (not V — the square root is irrational) is the effect size:
    * 0 = independent, 10⁶ = perfect association. NULL when min(r,c) < 2.
    * Integer headroom: (o·n − rₐ·c_b)² ≤ n⁴ fits DECIMAL(38,0) for
    * groups up to ~3·10⁹ rows; pre-aggregate beyond.
    *
    * @return (grp, n, n_rows, n_cols, chi2_milli, v2_ppm)
    */
  def cramersV(df: DataFrame, group: Column, rowVar: Column,
               colVar: Column): DataFrame = {
    val cells = df
      .select(group.cast("string").as("grp"), rowVar.cast("string").as("av"),
        colVar.cast("string").as("bv"))
      .filter(col("av").isNotNull && col("bv").isNotNull)
      .groupBy(col("grp"), col("av"), col("bv"))
      .agg(count(lit(1)).as("o"))
    val rmarg = cells.groupBy(col("grp"), col("av")).agg(sum(col("o")).as("ra"))
    val cmarg = cells.groupBy(col("grp"), col("bv")).agg(sum(col("o")).as("cb"))
    // full cross product of margins: zero cells carry their expectation
    val full = rmarg.join(cmarg, Seq("grp"))
      .join(cells, Seq("grp", "av", "bv"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val tot = cells.groupBy(col("grp"))
      .agg(sum(col("o")).as("n"),
        count_distinct(col("av")).as("n_rows"),
        count_distinct(col("bv")).as("n_cols"))
    full.join(tot, Seq("grp"))
      .withColumn("__t",
        expr("""(CAST(o AS DECIMAL(38,0)) * n - CAST(ra AS DECIMAL(38,0)) * cb)
               | * (CAST(o AS DECIMAL(38,0)) * n
               |    - CAST(ra AS DECIMAL(38,0)) * cb) * 1000
               | div (CAST(n AS DECIMAL(38,0)) * ra * cb)""".stripMargin))
      .groupBy(col("grp"))
      .agg(first(col("n")).as("n"), first(col("n_rows")).as("n_rows"),
        first(col("n_cols")).as("n_cols"),
        sum(col("__t")).cast("long").as("chi2_milli"))
      .withColumn("v2_ppm",
        when(least(col("n_rows"), col("n_cols")) < 2, lit(null))
          .otherwise(expr(
            """CAST(CAST(chi2_milli AS DECIMAL(38,0)) * 1000
              | div (CAST(n AS DECIMAL(38,0))
              |      * (least(n_rows, n_cols) - 1)) AS BIGINT)"""
              .stripMargin)))
  }

  /** R128: ABC / Pareto classification per group — entities ranked by
    * descending mass, classed by where their cumulative share STARTS:
    * A while cum−x < 70% of total, B while < 90%, else C (so the entity
    * crossing a boundary belongs to the class it entered in — every
    * group with mass has a nonempty A). Comparisons are cross-multiplied
    * integers; the cumulative mass comes from a grouped two-stage prefix
    * sum (per-(group, range-bucket) totals + a metadata-sized offset
    * window + an intra-bucket running sum — the [[Ranking.rankExact]]
    * posture applied to mass, no data-sized single-partition window).
    * Aggregated to one row per (group, class).
    *
    * @param df   one row per entity
    * @param group stratum key (column name)
    * @param x    nonnegative mass (cast to long)
    * @param tie  completes the (mass desc, tie asc) total order
    * @param aPpm class-A cumulative-share boundary (default 700000)
    * @param bPpm class-B boundary (default 900000)
    * @return (grp, abc_class, n_entities, mass, share_ppm)
    */
  def abcClassify(df: DataFrame, group: String, x: Column, tie: Column,
                  aPpm: Long = 700000L, bPpm: Long = 900000L,
                  buckets: Int = 4096): DataFrame = {
    require(0 < aPpm && aPpm < bPpm && bPpm <= 1000000L,
      s"bad boundaries: $aPpm, $bPpm")
    val base = df.select(col(group).cast("string").as("grp"),
        x.cast("long").as("x"), tie.as("tie"))
      .filter(col("x").isNotNull)
      .withColumn("__v", -col("x"))
    val stats = base.agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    val bucketed = base.crossJoin(broadcast(stats))
      .withColumn("__bkt",
        expr(s"(__v - __mn) div greatest(1L, (__mx - __mn) div $buckets + 1)"))
      .drop("__mn", "__mx")
    val perBucket = bucketed.groupBy(col("grp"), col("__bkt"))
      .agg(sum(col("x")).as("__m"))
    val wOff = Window.partitionBy(col("grp")).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("grp"))
    val offsets = perBucket.select(col("grp"), col("__bkt"),
      coalesce(sum(col("__m")).over(wOff), lit(0L)).as("__off"),
      sum(col("__m")).over(wTot).as("__total"))
    val wIntra = Window.partitionBy(col("grp"), col("__bkt"))
      .orderBy(col("__v"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(offsets, Seq("grp", "__bkt"))
      .withColumn("__cum", col("__off") + sum(col("x")).over(wIntra))
      .withColumn("abc_class",
        when(expr(s"CAST(__cum - x AS DECIMAL(38,0)) * 1000000 "
          + s"< CAST($aPpm AS DECIMAL(38,0)) * __total"), "A")
          .when(expr(s"CAST(__cum - x AS DECIMAL(38,0)) * 1000000 "
            + s"< CAST($bPpm AS DECIMAL(38,0)) * __total"), "B")
          .otherwise("C"))
      .groupBy(col("grp"), col("abc_class"))
      .agg(count(lit(1)).as("n_entities"), sum(col("x")).as("mass"),
        first(col("__total")).as("__t"))
      .select(col("grp"), col("abc_class"), col("n_entities"), col("mass"),
        expr("""CAST(CAST(mass AS DECIMAL(38,0)) * 1000000
               | div nullif(__t, 0) AS BIGINT)""".stripMargin)
          .as("share_ppm"))
  }

  /** R131: exact autocorrelation at the requested lags per group — the
    * seasonality/drift screen ("does this series remember itself k
    * steps back") in exact integers. The textbook estimator
    * r_k = Σ(xₜ−μ)(xₜ₋ₖ−μ) / Σ(xₜ−μ)² is rational once both sides are
    * scaled by n²  (n·xₜ − S replaces xₜ − μ), leaving ONE floor
    * division applied to the MAGNITUDE with the sign reattached — floor
    * and truncate agree on nonnegative operands, so Spark `div` and
    * DuckDB `//` land the same integer even for negative correlations:
    *
    *   acf_ppm = sign(num) · (|num|·10⁶ div den)
    *
    * Positions come from [[Ranking.rankExact]] on (ts, id) — the
    * two-stage exact rank — and the lag pairing is a self-join on
    * (grp, t−k): all hash-partitioned, no data-sized single-partition
    * sort. NULL when the series is constant (den = 0) or shorter than
    * the lag. Headroom: (n·x)² fits DECIMAL(38,0) for n·x < ~10¹⁹.
    *
    * @param lags lags in positions (≥ 1)
    * @return (grp, lag, n, acf_ppm) one row per (group, lag)
    */
  def autocorrelation(df: DataFrame, group: String, ts: Column, id: Column,
                      x: Column, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"bad lags: $lags")
    val base = df.select(col(group).cast("string").as("grp"),
        ts.cast("long").as("ts"), id.as("id"), x.cast("long").as("x"))
      .filter(col("x").isNotNull && col("ts").isNotNull)
    val ranked = Ranking.rankExact(base, Seq("grp"), col("ts"),
        Seq(col("id")), "t")
      .select(col("grp"), col("t"), col("x"), col("__total").as("n"))
    // centered-by-n² sums: den over all t, num over the lagged pairs
    val withS = ranked.join(
      ranked.groupBy(col("grp")).agg(sum(col("x")).as("s")), Seq("grp"))
    val den = withS.groupBy(col("grp"))
      .agg(first(col("n")).as("n"),
        sum(expr("""(CAST(n AS DECIMAL(38,0)) * x - s)
                   | * (CAST(n AS DECIMAL(38,0)) * x - s)""".stripMargin))
          .as("__den"))
    val lagged = withS.withColumn("lag", explode(array(lags.map(lit): _*)))
    val num = lagged.alias("cur")
      .join(withS.alias("prev"),
        col("cur.grp") === col("prev.grp") &&
          col("cur.t") - col("cur.lag") === col("prev.t"))
      .select(col("cur.grp").as("grp"), col("cur.lag").as("lag"),
        expr("""(CAST(cur.n AS DECIMAL(38,0)) * cur.x - cur.s)
               | * (CAST(prev.n AS DECIMAL(38,0)) * prev.x - prev.s)"""
          .stripMargin).as("__term"))
      .groupBy(col("grp"), col("lag"))
      .agg(sum(col("__term")).as("__num"))
    den.withColumn("lag", explode(array(lags.map(lit): _*)))
      .join(num, Seq("grp", "lag"), "left")
      .select(col("grp"), col("lag").cast("long").as("lag"), col("n"),
        when(col("__den") === 0 || col("n") <= col("lag") ||
             col("__num").isNull, lit(null))
          .otherwise(
            expr("""CASE WHEN __num < 0
                   |THEN -CAST((-__num) * 1000000 div __den AS BIGINT)
                   |ELSE CAST(__num * 1000000 div __den AS BIGINT)
                   |END""".stripMargin)).as("acf_ppm"))
  }

  /** R123: Spearman rank correlation per group under the UNIQUE-RANK
    * contract — ties broken by the id column so both engines assign the
    * same total order, which keeps the classic closed form exact:
    *
    *   rho_ppm = 10⁶ − (6·Σ dᵢ² · 10⁶) div (n·(n²−1)),  d = rank_x − rank_y
    *
    * The subtrahend is nonnegative, so the single floor division never
    * meets a negative operand (floor vs truncate agree); rho_ppm itself
    * ranges −10⁶…10⁶. Both rank passes go through [[Ranking.rankExact]].
    * Groups with n < 2 return NULL (no variance to correlate).
    *
    * @param df    input
    * @param group stratum key (column name)
    * @param xcol  first score (cast to long)
    * @param ycol  second score (cast to long)
    * @param id    unique tie-break id
    * @return (grp, n, d2_sum, rho_ppm) one row per group
    */
  def spearman(df: DataFrame, group: String, xcol: Column, ycol: Column,
               id: Column): DataFrame = {
    val base = df.select(col(group).cast("string").as("grp"),
        xcol.cast("long").as("x"), ycol.cast("long").as("y"), id.as("id"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val rx = Ranking.rankExact(base, Seq("grp"), col("x"), Seq(col("id")),
      "rx").drop("__total")
    val rxy = Ranking.rankExact(rx, Seq("grp"), col("y"), Seq(col("id")),
      "ry").drop("__total")
    rxy
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(rx - ry AS DECIMAL(38,0)) * (rx - ry)"))
          .as("__d2"))
      .select(col("grp"), col("n"),
        col("__d2").cast("long").as("d2_sum"),
        expr("""CASE WHEN n < 2 THEN NULL
               |ELSE 1000000 - CAST(6 * __d2 * 1000000
               |  div (CAST(n AS DECIMAL(38,0)) * n * n - n) AS BIGINT)
               |END""".stripMargin).as("rho_ppm"))
  }

  /** R138: Kendall rank correlation from the CONTINGENCY GRID — the
    * concordant/discordant pair counts computed on the (x, y) VALUE
    * grid, never on row pairs: for cell pairs with x' < x, a y' < y
    * cell contributes c·c' concordant pairs and a y' > y cell c·c'
    * discordant ones; ties come from the marginals
    * (t_x = Σ_x n_x(n_x−1)/2, likewise t_y). The grid is domain-sized
    * (|X|·|Y| cells per group), so the within-group grid self-join is
    * metadata-sized even when the data is 100 TB — the same compression
    * as R120's rank grid. Intended for small integer domains (buckets,
    * grades, calendar parts); wide domains belong to R123 Spearman.
    *
    * tau-b's denominator is a square root, so the exact gate-able
    * numbers are the pair counts plus two exact ratios:
    * tau-a = (C−D)·10⁶ div n₀ and the sign-carried square
    * tau_b² = sign(C−D)·(C−D)²·10⁶ div ((n₀−t_x)(n₀−t_y)) — the R135
    * signed-magnitude contract (floor ≡ trunc on the nonneg magnitude).
    *
    * @return (grp, n, nc, nd, tx, ty, tau_a_ppm, tau_b_sq_ppm); both
    *         metrics null when n < 2, tau_b² additionally null when a
    *         margin is fully tied (denominator 0)
    */
  /** R141: Welch's unequal-variance t² — the parametric two-sample
    * location test (R120's mean-based sibling), EXACTLY rational because
    * the n₁²n₂² factors cancel:
    *
    *   t² = D²·(n₁−1)(n₂−1) div [A·n₂²(n₂−1) + B·n₁²(n₁−1)],
    *   D = S₁n₂ − S₂n₁,  A = n₁Q₁ − S₁²,  B = n₂Q₂ − S₂²
    *
    * (S = Σx, Q = Σx² per side) — reported ×1000 (milli), D² nonneg so
    * the one floor division never sees a negative numerator; the signed
    * mean difference ships separately as mean_diff_milli = sign-carried
    * D·1000 div (n₁n₂). t is the square root — irrational, so t² is the
    * gate-able number, exactly like R115b's χ² and R138's tau-b².
    * NULL when either side has n < 2 or both sides are constant
    * (denominator 0). Headroom: D²·(n−1)²·1000 inside DECIMAL(38,0) —
    * for a 50-value domain that is n ≲ 5·10⁵ per group, stated like
    * R126's per-group bound.
    *
    * One hash aggregate to (group, side) moments, then arithmetic on
    * the two-row-per-group table — nothing data-sized after the scan.
    * The moments tail is split out ([[welchFromMoments]]) so a
    * streaming twin can maintain (n, S, Q) per cell and drain through
    * the identical arithmetic.
    *
    * @return (grp, n_a, n_b, s_a, s_b, mean_diff_milli, t2_milli)
    */
  def welchT2(df: DataFrame, group: Column, side: Column,
              x: Column): DataFrame = {
    val cells = df.select(group.cast("string").as("grp"),
        side.cast("boolean").as("s"), x.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("grp"), col("s"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sx"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("qx"))
    welchFromMoments(cells)
  }

  /** The R141 arithmetic tail over (grp, s, n, sx, qx) moment cells —
    * shared verbatim by the batch operator and the X34 streaming twin.
    */
  def welchFromMoments(cells: DataFrame): DataFrame = {
    val a = cells.filter(col("s"))
      .select(col("grp"), col("n").as("n_a"), col("sx").as("s_a"),
        col("qx").as("q_a"))
    val b = cells.filter(!col("s"))
      .select(col("grp"), col("n").as("n_b"), col("sx").as("s_b"),
        col("qx").as("q_b"))
    a.join(b, Seq("grp"), "full_outer")
      .select(col("grp"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("s_a"), lit(0L)).as("s_a"),
        coalesce(col("s_b"), lit(0L)).as("s_b"),
        coalesce(col("q_a"), expr("CAST(0 AS DECIMAL(38,0))")).as("__qa"),
        coalesce(col("q_b"), expr("CAST(0 AS DECIMAL(38,0))")).as("__qb"))
      .withColumn("__d",
        expr("CAST(s_a AS DECIMAL(38,0)) * n_b - CAST(s_b AS DECIMAL(38,0)) * n_a"))
      .withColumn("__aa", expr("n_a * __qa - CAST(s_a AS DECIMAL(38,0)) * s_a"))
      .withColumn("__bb", expr("n_b * __qb - CAST(s_b AS DECIMAL(38,0)) * s_b"))
      .withColumn("__den", expr(
        """__aa * (CAST(n_b AS DECIMAL(38,0)) * n_b) * (n_b - 1)
          | + __bb * (CAST(n_a AS DECIMAL(38,0)) * n_a) * (n_a - 1)"""
          .stripMargin))
      .withColumn("mean_diff_milli",
        when(col("n_a") === 0 || col("n_b") === 0, lit(null))
          .otherwise(expr("""CASE WHEN __d >= 0
            |THEN CAST(__d * 1000 div (CAST(n_a AS DECIMAL(38,0)) * n_b)
            |  AS BIGINT)
            |ELSE -CAST((-__d) * 1000 div (CAST(n_a AS DECIMAL(38,0)) * n_b)
            |  AS BIGINT)
            |END""".stripMargin)))
      .withColumn("t2_milli",
        when(col("n_a") < 2 || col("n_b") < 2 || col("__den") <= 0, lit(null))
          .otherwise(expr(
            """CAST(__d * __d * (n_a - 1) * (n_b - 1) * 1000 div __den
              | AS BIGINT)""".stripMargin)))
      .select(col("grp"), col("n_a"), col("n_b"), col("s_a"), col("s_b"),
        col("mean_diff_milli"), col("t2_milli"))
  }

  /** R155: deterministic permutation test for the two-sample mean
    * difference — the exact-inference member of the triad (R141 Welch
    * assumes, R154 bootstraps, this PERMUTES): B label shuffles drawn
    * by hash48, each permutation b re-assigning side A to the first
    * n_a rows of the (hash48(grp:b:id), id) order within the group.
    * Extremeness never divides: on the common n_a·n_b denominator,
    * |mean diff_b| ≥ |mean diff_obs| ⟺
    * |S_Ab·n_b − S_Bb·n_a| ≥ |S_a·n_b − S_b·n_a| — an INTEGER
    * comparison, so the p-value is exact:
    * p_ppm = (1 + #extreme)·10⁶ div (B + 1) (the add-one convention,
    * stated — the observed labeling counts as one permutation).
    *
    * Work: n·B rows, one per-(grp, b) window over the group's rows,
    * one aggregate; sums in DECIMAL(38,0) (cents · 10⁵-row groups stay
    * far inside).
    *
    * @return (grp, n_a, n_b, mean_diff_milli, n_extreme, p_ppm)
    */
  def permutationTest(df: DataFrame, group: String, side: Column, x: Column,
                      id: Column, b: Int): DataFrame = {
    require(b >= 2, s"b must be >= 2, got $b")
    val spark = df.sparkSession
    val base = df.select(col(group).cast("string").as("grp"),
        side.cast("boolean").as("s"), x.cast("long").as("v"),
        id.cast("long").as("id"))
      .filter(col("v").isNotNull)
    val obs = base.groupBy(col("grp"))
      .agg(sum(when(col("s"), 1L).otherwise(0L)).as("n_a"),
        count(lit(1)).as("n"),
        sum(when(col("s"), col("v")).otherwise(0L)).as("s_a"),
        sum(col("v")).as("__st"))
      .withColumn("n_b", col("n") - col("n_a"))
      .withColumn("s_b", col("__st") - col("s_a"))
      .withColumn("__dobs", expr(
        "abs(CAST(s_a AS DECIMAL(38,0)) * n_b - CAST(s_b AS DECIMAL(38,0)) * n_a)"))
    val bs = spark.range(1, b + 1).toDF("b")
    val w = Window.partitionBy(col("grp"), col("b"))
      .orderBy(col("__h"), col("id"))
    val perms = base.crossJoin(broadcast(bs))
      .withColumn("__h", graft.sketches.Kmv.hash48(
        concat_ws(":", col("grp"), col("b").cast("string"),
          col("id").cast("string"))))
      .withColumn("__r", row_number().over(w).cast("long"))
      .join(obs.select(col("grp"), col("n_a"), col("__st")), Seq("grp"))
      .groupBy(col("grp"), col("b"))
      .agg(sum(when(col("__r") <= col("n_a"), col("v")).otherwise(0L))
          .as("__sa"),
        max(col("n_a")).as("n_a"), max(col("__st")).as("__st"))
      .withColumn("__sb", col("__st") - col("__sa"))
    val extreme = perms
      .join(obs.select(col("grp"), col("n_b").as("__nb"), col("__dobs")),
        Seq("grp"))
      .withColumn("__db", expr(
        "abs(CAST(__sa AS DECIMAL(38,0)) * __nb - CAST(__sb AS DECIMAL(38,0)) * n_a)"))
      .groupBy(col("grp"))
      .agg(sum(when(col("__db") >= col("__dobs"), 1L).otherwise(0L))
        .as("n_extreme"))
    obs.join(extreme, Seq("grp"))
      .select(col("grp"), col("n_a"), col("n_b"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(null))
          .otherwise(expr("""CASE
            |WHEN CAST(s_a AS DECIMAL(38,0)) * n_b
            |     - CAST(s_b AS DECIMAL(38,0)) * n_a >= 0
            |THEN CAST((CAST(s_a AS DECIMAL(38,0)) * n_b
            |  - CAST(s_b AS DECIMAL(38,0)) * n_a) * 1000
            |  div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)
            |ELSE -CAST((CAST(s_b AS DECIMAL(38,0)) * n_a
            |  - CAST(s_a AS DECIMAL(38,0)) * n_b) * 1000
            |  div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)
            |END""".stripMargin)).as("mean_diff_milli"),
        col("n_extreme"),
        expr(s"(1 + n_extreme) * 1000000 div (${b} + 1)").as("p_ppm"))
  }

  def kendallTau(df: DataFrame, group: String, xcol: Column,
                 ycol: Column): DataFrame = {
    val cells = df.select(col(group).cast("string").as("grp"),
        xcol.cast("long").as("x"), ycol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("grp"), col("x"), col("y"))
      .agg(count(lit(1)).as("c"))
    val cd = cells
      .join(cells.select(col("grp"), col("x").as("x2"), col("y").as("y2"),
        col("c").as("c2")), Seq("grp"))
      .filter(col("x2") < col("x") && col("y2") =!= col("y"))
      .groupBy(col("grp"))
      .agg(
        sum(when(col("y2") < col("y"), col("c") * col("c2"))
          .otherwise(lit(0L))).as("__nc"),
        sum(when(col("y2") > col("y"), col("c") * col("c2"))
          .otherwise(lit(0L))).as("__nd"))
    val tx = cells.groupBy(col("grp"), col("x"))
      .agg(sum(col("c")).as("nx"))
      .groupBy(col("grp"))
      .agg(sum(expr("nx * (nx - 1) div 2")).as("tx"))
    val ty = cells.groupBy(col("grp"), col("y"))
      .agg(sum(col("c")).as("ny"))
      .groupBy(col("grp"))
      .agg(sum(expr("ny * (ny - 1) div 2")).as("ty"))
    cells.groupBy(col("grp")).agg(sum(col("c")).as("n"))
      .join(cd, Seq("grp"), "left")
      .join(tx, Seq("grp")).join(ty, Seq("grp"))
      .select(col("grp"), col("n"),
        coalesce(col("__nc"), lit(0L)).as("nc"),
        coalesce(col("__nd"), lit(0L)).as("nd"),
        col("tx"), col("ty"))
      .withColumn("__n0", expr("n * (n - 1) div 2"))
      .withColumn("tau_a_ppm",
        when(col("__n0") === 0, lit(null))
          .otherwise(expr("""CASE WHEN nc >= nd
            |THEN CAST((CAST(nc AS DECIMAL(38,0)) - nd) * 1000000
            |  div __n0 AS BIGINT)
            |ELSE -CAST((CAST(nd AS DECIMAL(38,0)) - nc) * 1000000
            |  div __n0 AS BIGINT)
            |END""".stripMargin)))
      .withColumn("__den",
        expr("(CAST(__n0 AS DECIMAL(38,0)) - tx) * (__n0 - ty)"))
      .withColumn("tau_b_sq_ppm",
        when(col("__n0") === 0 || col("__den") <= 0, lit(null))
          .otherwise(expr("""CASE WHEN nc >= nd
            |THEN CAST((CAST(nc AS DECIMAL(38,0)) - nd) * (nc - nd) * 1000000
            |  div __den AS BIGINT)
            |ELSE -CAST((CAST(nd AS DECIMAL(38,0)) - nc) * (nd - nc) * 1000000
            |  div __den AS BIGINT)
            |END""".stripMargin)))
      .drop("__n0", "__den")
  }
}
