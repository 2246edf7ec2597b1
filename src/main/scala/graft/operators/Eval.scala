package graft.operators

import graft.PlanProbe.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R108: exact AUC (Mann–Whitney U) per group — the ranking-model eval
  * metric computed WITHOUT floats and WITHOUT a global rank: AUC is the
  * probability a random positive outscores a random negative, so
  *
  *   U×2 = Σ_{distinct score s} np_s · (2·negatives_below(s) + nn_s)
  *
  * (ties contribute ½ each, hence the ×2 scaling stays integral). The
  * only window runs over DISTINCT SCORES within a group — the compressed
  * domain, not the rows — after one (group, score) aggregate; the same
  * identity embeds verbatim in the SQL oracle, so the metric is
  * engine-exact down to the last tie.
  *
  * At 100 TB: one hash aggregate on (group, score), a per-group window
  * over the score domain, one 3-value reduce. No row-level sort, no
  * single-partition rank.
  */
object Eval {
  /** R109: calibration report — scores normalized to ppm of the max,
    * bucketed into `bins` equal-width bins; per bin the observed
    * positive rate vs the mean normalized score (a calibrated scorer
    * has them tracking). All integer ppm arithmetic.
    *
    * @return (bin, n, n_pos, pos_rate_ppm, mean_score_ppm)
    */
  def calibration(rows: DataFrame, label: Column, score: Column,
                  bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val mx = rows.agg(max(score).cast("long").as("__mx"))
    rows.select(label.as("lbl"), score.cast("long").as("scr"))
      .crossJoin(broadcast(mx))
      .withColumn("score_ppm", expr("scr * 1000000 div __mx"))
      .withColumn("bin",
        least(expr(s"score_ppm * $bins div 1000000"), lit(bins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lbl"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("score_ppm")).as("__ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 div n").as("pos_rate_ppm"),
        expr("__ssum div n").as("mean_score_ppm"))
  }

  /** R110: confusion matrix at a threshold, with exact ppm metrics —
    * TP/FP/TN/FN in one aggregate; precision, recall, and F1 as integer
    * ppm (F1 via the 2TP/(2TP+FP+FN) identity, one floor division, no
    * rational-of-rational rounding). Undefined metrics (no predicted
    * positives / no actual positives) report null.
    *
    * @return one row: (n, tp, fp, tn, fn, precision_ppm, recall_ppm,
    *         f1_ppm)
    */
  def confusionAtThreshold(rows: DataFrame, label: Column, score: Column,
                           threshold: Column): DataFrame = {
    val pred = score >= threshold
    rows.agg(
        count(lit(1)).as("n"),
        sum(when(label && pred, 1L).otherwise(0L)).as("tp"),
        sum(when(!label && pred, 1L).otherwise(0L)).as("fp"),
        sum(when(!label && !pred, 1L).otherwise(0L)).as("tn"),
        sum(when(label && !pred, 1L).otherwise(0L)).as("fn"))
      .select(col("n"), col("tp"), col("fp"), col("tn"), col("fn"),
        when(col("tp") + col("fp") === 0, lit(null))
          .otherwise(expr("tp * 1000000 div (tp + fp)")).as("precision_ppm"),
        when(col("tp") + col("fn") === 0, lit(null))
          .otherwise(expr("tp * 1000000 div (tp + fn)")).as("recall_ppm"),
        when(col("tp") * 2 + col("fp") + col("fn") === 0, lit(null))
          .otherwise(expr("tp * 2000000 div (2 * tp + fp + fn)"))
          .as("f1_ppm"))
  }

  /** R111: stratified k-fold assignment — fold id per example such that
    * every stratum (label value) splits across folds within ±1: rows
    * rank by md5-of-id WITHIN their stratum and fold = rank mod k. Hash
    * order makes folds reproducible and id-stable (adding rows
    * elsewhere never reshuffles an untouched stratum... it can shift
    * mod positions — the documented trade vs bucketing by raw hash,
    * which balances only in expectation; exact ±1 balance needs the
    * rank). One window per stratum.
    *
    * @return input id + stratum + fold ∈ [0, k)
    */
  def stratifiedFolds(rows: DataFrame, id: Column, stratum: Column,
                      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(col("stratum"))
      .orderBy(md5(col("id").cast("string")), col("id"))
    rows.select(id.as("id"), stratum.as("stratum"))
      .withColumn("fold", (row_number().over(w) - 1) % k)
      .withColumn("fold", col("fold").cast("long"))
  }

  /** R114: point-in-time feature assembly — for every labeled example,
    * aggregates over the SAME entity's strictly-earlier history: the
    * feature-store primitive whose absence causes train-time leakage
    * (a feature computed over all-time includes the label's own era;
    * offline metrics inflate, production collapses). The strict
    * exclusive frame (unbounded preceding .. −1 row, ordered by event
    * time with an id tie-break) is the whole trick — one window per
    * entity, the same shuffle any per-entity pass pays, no self-join.
    *
    * @param events one row per (entity, ts) example; `value` feeds the
    *               sum feature
    * @return input keys + n_prior (count of earlier rows), sum_prior
    *         (value sum over them), gap_sec (seconds since the previous
    *         row, null for an entity's first)
    */
  def pointInTimeFeatures(events: DataFrame, entity: Column, id: Column,
                          tsSec: Column, value: Column): DataFrame = {
    val base = events.select(entity.as("entity"), id.as("id"),
      tsSec.cast("long").as("ts_sec"), value.cast("long").as("v"))
    val order = Window.partitionBy(col("entity"))
      .orderBy(col("ts_sec"), col("id"))
    val hist = order.rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("n_prior", coalesce(count(col("v")).over(hist), lit(0L)))
      .withColumn("sum_prior", coalesce(sum(col("v")).over(hist), lit(0L)))
      .withColumn("gap_sec", col("ts_sec") - lag(col("ts_sec"), 1).over(order))
      .select(col("entity"), col("id"), col("ts_sec"), col("n_prior"),
        col("sum_prior"), col("gap_sec"))
  }

  /** R113: time split with embargo — the leakage-safe train/test carve
    * for temporally-correlated data (the financial-ML staple): the
    * split point is the exact nearest-rank `trainPpm` percentile of the
    * time column, an embargo band of `embargoSec` after it belongs to
    * NEITHER side (features computed near the boundary see both eras —
    * the rows a random split would silently leak through), test is
    * everything after the band.
    *
    * The percentile is found WITHOUT a global row sort: one (ts) count
    * aggregate, then a TWO-STAGE cumulative over the distinct-ts domain
    * (a 100 TB event table with fine timestamps has a distinct-ts domain
    * ≈ row count, so even the compressed scan must stay partitioned):
    * range-bucket the ts domain, exclusive-prefix the ≤4097 BUCKET
    * TOTALS (the only unpartitioned window — metadata, never data), and
    * run the intra-bucket cumulative partitioned by bucket — the
    * [[PrefixSum]] posture. The cut is the min ts whose cumulative count
    * reaches ⌈n·p⌉.
    *
    * @return input id + ts + split ∈ {'train', 'embargo', 'test'}
    */
  def timeSplitEmbargo(rows: DataFrame, id: Column, tsSec: Column,
                       trainPpm: Long, embargoSec: Long): DataFrame = {
    require(trainPpm >= 1 && trainPpm <= 999999, s"trainPpm: $trainPpm")
    require(embargoSec >= 0, s"embargoSec: $embargoSec")
    val base = rows.select(id.as("id"), tsSec.cast("long").as("ts_sec"))
    val perTs = base.groupBy(col("ts_sec")).agg(count(lit(1)).as("c"))
    val stats = perTs.agg(min(col("ts_sec")).as("__mn"),
      max(col("ts_sec")).as("__mx"))
    val bucketed = perTs.crossJoin(broadcast(stats))
      .withColumn("__bkt",
        expr("(ts_sec - __mn) div greatest(1L, (__mx - __mn) div 4096 + 1)"))
    val wOff = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the ONLY unpartitioned window: ≤4097 bucket totals
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("c")).as("__s"))
      .select(col("__bkt"), coalesce(sum(col("__s")).over(wOff), lit(0L))
        .as("__off"))
    val wIntra = Window.partitionBy(col("__bkt")).orderBy(col("ts_sec"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cut = bucketed.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("cum", col("__off") + sum(col("c")).over(wIntra))
      .crossJoin(broadcast(perTs.agg(sum(col("c")).as("__n"))))
      .filter(col("cum") * 1000000L >= col("__n") * trainPpm)
      .agg(min(col("ts_sec")).as("__t_split"))
    base.crossJoin(broadcast(cut))
      .withColumn("split",
        when(col("ts_sec") <= col("__t_split"), "train")
          .when(col("ts_sec") <= col("__t_split") + embargoSec, "embargo")
          .otherwise("test"))
      .select(col("id"), col("ts_sec"), col("split"))
  }

  /** R112: Cohen's kappa between two labelings, exact — chance-corrected
    * agreement κ = (p_o − p_e)/(1 − p_e) computed cross-multiplied:
    *
    *   kappa_ppm = (n·agree − Σ_c na_c·nb_c) · 1e6 div (n² − Σ_c na_c·nb_c)
    *
    * one pass for the agreement count + per-rater marginals, integer
    * throughout; κ is the "are these two labeling pipelines actually
    * measuring the same thing" gate raw agreement overstates under
    * class imbalance. Degenerate marginals (p_e = 1) report null.
    *
    * @return one row: (n, n_agree, agree_ppm, kappa_ppm)
    */
  def cohensKappa(rows: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val cells = rows.select(labelA.cast("string").as("a"),
        labelB.cast("string").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      .ckpt
    val n = cells.agg(sum(col("c"))).head().getLong(0)
    val agree = cells.filter(col("a") === col("b"))
      .agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    val chance = cells.groupBy(col("a")).agg(sum(col("c")).as("na"))
      .join(cells.groupBy(col("b")).agg(sum(col("c")).as("nb")),
        col("a") === col("b"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)))
      .head().getLong(0)
    val spark = rows.sparkSession
    import spark.implicits._
    Seq((n, agree)).toDF("n", "n_agree")
      .select(col("n"), col("n_agree"),
        expr("n_agree * 1000000 div n").as("agree_ppm"),
        (if (n * n == chance) lit(null)
         else lit((n * agree - chance) * 1000000L / (n * n - chance)))
          .as("kappa_ppm"))
  }

  /** R115b: 2×2 chi-square independence test per group — the
    * experimentation primitive ("does treatment move the outcome?") in
    * exact integer arithmetic: with the contingency cells a=A∧B, b=A∧¬B,
    * c=¬A∧B, d=¬A∧¬B,
    *
    *   chi2_ppm = n·(ad−bc)²·10⁶ div ((a+b)(c+d)(a+c)(b+d))
    *
    * — one floor division, DECIMAL(38,0) headroom for the n·(ad−bc)²·10⁶
    * product (≈5·10²⁸ at 10⁵ rows/group, well inside 38 digits), so the
    * statistic is bit-identical across engines where a float χ² differs
    * in the last ulps. Degenerate margins (an empty row or column —
    * χ² undefined) report null. One aggregate pass per group; at 100 TB
    * this is a map-side-combined count scan, nothing else.
    *
    * @return (grp, n, a, b, c, d, chi2_ppm)
    */
  def chiSquare2x2(rows: DataFrame, group: Column, condA: Column,
                   condB: Column): DataFrame = {
    rows.select(group.as("grp"), condA.as("pa"), condB.as("pb"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pa") && col("pb"), 1L).otherwise(0L)).as("a"),
        sum(when(col("pa") && !col("pb"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("pa") && col("pb"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("pa") && !col("pb"), 1L).otherwise(0L)).as("d"))
      .withColumn("chi2_ppm",
        when((col("a") + col("b")) * (col("c") + col("d")) *
             (col("a") + col("c")) * (col("b") + col("d")) === 0, lit(null))
          .otherwise(expr(
            """CAST(n AS DECIMAL(38,0)) * (a*d - b*c) * (a*d - b*c) * 1000000
              | div (CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c)
              |      * (b + d))""".stripMargin)))
  }

  /** R115c: Gini-impurity split scoring — the decision-tree / feature-
    * selection primitive: per candidate feature value v, the impurity of
    * the label distribution inside that slice,
    *
    *   gini_ppm(v) = (n_v² − Σ_c n_vc²)·10⁶ div n_v²
    *
    * (single floor division — Gini is exactly rational, which is why it
    * gates here while entropy's log never could), plus the slice's
    * weight in ppm of the table. A low weighted sum means the feature
    * separates the label well. Two hash aggregates ((v, c) counts, then
    * per-v sums) — no window, no join; the 100 TB cost is one scan.
    *
    * @return (feature_value, n, n_classes, gini_ppm, weight_ppm)
    */
  def giniSplit(rows: DataFrame, feature: Column, label: Column): DataFrame = {
    val cells = rows.select(feature.cast("string").as("feature_value"),
        label.cast("string").as("lbl"))
      .groupBy(col("feature_value"), col("lbl")).agg(count(lit(1)).as("c"))
    val perValue = cells.groupBy(col("feature_value"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_classes"),
        sum(col("c") * col("c")).as("__sq"))
    val total = perValue.agg(sum(col("n")).as("__n_total"))
    perValue.crossJoin(broadcast(total))
      .select(col("feature_value"), col("n"), col("n_classes"),
        expr("(n * n - __sq) * 1000000 div (n * n)").as("gini_ppm"),
        expr("n * 1000000 div __n_total").as("weight_ppm"))
  }

  /** R115d: gains/lift table — rank every example by score descending,
    * cut into `tiles` equal-depth buckets on the EXACT two-stage rank
    * ([[Ranking.ntileExact]] — no data-sized single-partition NTILE
    * window), and report per tile the positive capture: cumulative
    * positives as ppm of all positives (the gains curve) and lift vs
    * random targeting,
    *
    *   lift_ppm = cum_pos·n_total·10⁶ div (cum_n·total_pos)
    *
    * — the "top decile catches X% of responders" table every targeting /
    * triage model ships with. The only unpartitioned windows run over
    * the `tiles`-row result (metadata). DECIMAL(38,0) headroom for the
    * cum_pos·n·10⁶ product. Tables with zero positives report null ppm.
    *
    * @param id completes the (score desc, id) total order so tile
    *           assignment is deterministic and engine-identical
    * @return (tile, n, n_pos, cum_n, cum_pos, capture_ppm, lift_ppm)
    */
  def gainsTable(rows: DataFrame, label: Column, score: Column, id: Column,
                 tiles: Int): DataFrame = {
    require(tiles >= 2, s"tiles must be >= 2, got $tiles")
    val base = rows.select(label.as("lbl"), score.cast("long").as("scr"),
      id.as("id"))
    val tiled = Ranking.ntileExact(base, Seq.empty, -col("scr"),
      Seq(col("id")), tiles, "tile")
    val perTile = tiled.groupBy(col("tile"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lbl"), 1L).otherwise(0L)).as("n_pos"))
    // tiles-row metadata: the cumulative windows are over ≤ `tiles` rows
    val wCum = Window.orderBy(col("tile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    perTile
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("__tp", sum(col("n_pos")).over(wTot))
      .withColumn("__nt", sum(col("n")).over(wTot))
      .select(col("tile"), col("n"), col("n_pos"), col("cum_n"),
        col("cum_pos"),
        when(col("__tp") === 0, lit(null))
          .otherwise(expr("cum_pos * 1000000 div __tp")).as("capture_ppm"),
        when(col("__tp") === 0, lit(null))
          .otherwise(expr(
            """CAST(cum_pos AS DECIMAL(38,0)) * __nt * 1000000
              | div (CAST(cum_n AS DECIMAL(38,0)) * __tp)""".stripMargin))
          .as("lift_ppm"))
  }

  /** R108 (see the object doc for the identity).
    * @param rows   one row per example
    * @param group  evaluation slice (model, segment, day, …)
    * @param label  boolean: positive class
    * @param score  model score; any orderable numeric (ties handled)
    * @return (group, n_pos, n_neg, u_stat_x2, auc_ppm) — auc_ppm =
    *         U×2 · 1e6 div (2·n_pos·n_neg); groups with no positives or
    *         no negatives report auc_ppm = null (undefined, not 0)
    */
  def aucByGroup(rows: DataFrame, group: Column, label: Column,
                 score: Column): DataFrame = {
    val perScore = rows
      .select(group.as("grp"), label.as("lbl"), score.as("scr"))
      .groupBy(col("grp"), col("scr"))
      .agg(sum(when(col("lbl"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("lbl"), 1L).otherwise(0L)).as("nn"))
    val w = Window.partitionBy(col("grp")).orderBy(col("scr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("cn_below", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("grp"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (col("cn_below") * 2 + col("nn"))).as("u_stat_x2"))
      .withColumn("auc_ppm",
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
          .otherwise(expr("u_stat_x2 * 1000000 div (2 * n_pos * n_neg)")))
  }

  /** R150 + R151: probabilistic-score quality — Brier score and
    * expected calibration error, both EXACTLY rational because the
    * per-bin means never materialize:
    *
    *   R150  brier_ppm2 = Σ(p − 10⁶·y)² div n         (p in ppm, y∈{0,1};
    *         Σ(p−10⁶y)² = Σp² − 2·10⁶·Σ(p·y) + 10¹²·Σy, so the sum
    *         assembles from FIVE bin moments — n, Σp, Σp², Σy, Σ(p over
    *         positives) — and the only division is the final one)
    *   R151  ece_ppm = Σ_bins |Σp_b − 10⁶·Σy_b| div n  (the n_b·|p̄−ȳ|
    *         weighting cancels n_b, so ECE needs no per-bin division
    *         at all — a single floor over the bin-absolute sums)
    *
    * Cells are (group, bin) moment rows — one hash aggregate, then
    * per-group arithmetic; the tail is split out
    * ([[scoreQualityFromCells]]) so a streaming twin can maintain the
    * five moments per cell and drain through identical arithmetic.
    *
    * @param rows     one scored example per row
    * @param group    evaluation slice
    * @param label    boolean: positive class
    * @param scorePpm model probability in ppm (0..10⁶)
    * @param bins     equal-width ECE bins over [0, 10⁶]
    * @return (grp, n, n_pos, mean_score_ppm, base_rate_ppm, brier_ppm2,
    *         ece_ppm)
    */
  def scoreQuality(rows: DataFrame, group: Column, label: Column,
                   scorePpm: Column, bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val cells = rows.select(group.cast("string").as("grp"),
        label.cast("boolean").as("y"), scorePpm.cast("long").as("p"))
      .filter(col("p").isNotNull)
      .withColumn("bin",
        least(expr(s"p * $bins div 1000000"), lit(bins - 1L)))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"),
        sum(expr("CAST(p AS DECIMAL(38,0)) * p")).as("sp2"),
        sum(when(col("y"), 1L).otherwise(0L)).as("sy"),
        sum(when(col("y"), col("p")).otherwise(0L)).as("spy"))
    scoreQualityFromCells(cells)
  }

  /** The R150/R151 arithmetic tail over (grp, bin, n, sp, sp2, sy, spy)
    * moment cells — shared verbatim by the batch operator and the X35
    * streaming twin.
    */
  def scoreQualityFromCells(cells: DataFrame): DataFrame =
    cells
      .groupBy(col("grp"))
      .agg(sum(col("n")).as("n"), sum(col("sp")).as("__sp"),
        sum(col("sp2")).as("__sp2"), sum(col("sy")).as("n_pos"),
        sum(col("spy")).as("__spy"),
        sum(abs(expr("CAST(sp AS DECIMAL(38,0)) - 1000000 * sy")))
          .as("__eceNum"))
      .select(col("grp"), col("n"), col("n_pos"),
        expr("__sp div n").as("mean_score_ppm"),
        expr("n_pos * 1000000 div n").as("base_rate_ppm"),
        expr("""CAST((__sp2 - 2000000 * CAST(__spy AS DECIMAL(38,0))
               | + CAST(1000000000000 AS DECIMAL(38,0)) * n_pos)
               | div n AS BIGINT)""".stripMargin).as("brier_ppm2"),
        expr("CAST(__eceNum div n AS BIGINT)").as("ece_ppm"))

  /** The R137 discount table: disc(i) = ⌊10⁶/log₂(i+1)⌋ for i = 1..k.
    * The irrational log never enters either engine's plan — the table is
    * a fixed literal shared verbatim by the operator and its SQL oracle,
    * part of the metric's definition exactly like the ppm scale itself.
    */
  def ndcgDiscountsPpm(k: Int): Seq[Long] =
    (1 to k).map(i =>
      math.floor(1000000.0 * math.log(2.0) / math.log(i + 1.0)).toLong)

  /** R137: NDCG@k — graded list quality in exact integer ppm.
    *
    *   DCG@k  = Σ_{i ≤ k} rel(position i) · disc(i)
    *   IDCG@k = the same sum with the list's OWN relevances sorted
    *            descending (presented-list convention: both sums run
    *            over the same k candidates, so 10⁶ means "this ordering
    *            is optimal for what was retrieved" — retrieval misses
    *            are S13/S14's recall story, not the ranking's)
    *   NDCG   = DCG·10⁶ div IDCG, null when IDCG = 0 (nothing relevant)
    *
    * At 100 TB: lists are k-bounded by construction, so the per-query
    * window is k-sized; one hash aggregate after it; the discount lookup
    * is a map literal in the plan — codegen-friendly, no join.
    *
    * @param rows  one row per (query, candidate) with its list position
    * @param query the list key
    * @param rel   integer graded relevance ≥ 0
    * @param pos   1-based position in the presented list
    * @param k     cutoff; positions > k are ignored
    * @return (query_id, dcg_ppm, idcg_ppm, ndcg_ppm)
    */
  def ndcgAtK(rows: DataFrame, query: Column, rel: Column, pos: Column,
              k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val discMap = typedLit(
      ndcgDiscountsPpm(k).zipWithIndex.map { case (d, i) => (i + 1L, d) }.toMap)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("pos"))
    rows.select(query.as("query_id"), rel.cast("long").as("rel"),
        pos.cast("long").as("pos"))
      .filter(col("pos") <= k)
      .withColumn("ipos", row_number().over(w).cast("long"))
      .withColumn("disc", element_at(discMap, col("pos")))
      .withColumn("idisc", element_at(discMap, col("ipos")))
      .groupBy(col("query_id"))
      .agg(sum(col("rel") * col("disc")).as("dcg_ppm"),
        sum(col("rel") * col("idisc")).as("idcg_ppm"))
      .withColumn("ndcg_ppm",
        when(col("idcg_ppm") === 0, lit(null))
          .otherwise(expr("dcg_ppm * 1000000 div idcg_ppm")))
  }
}
