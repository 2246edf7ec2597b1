package graft.operators

import graft.PlanProbe.CkptOps
import graft.sketches.Kmv
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling operators — the corpus-curation step between quality
  * scoring and training-set assembly: sample documents/events with
  * probability proportional to a score, deterministically.
  *
  * Both forms avoid `rand()`: randomness comes from `Kmv.hash48` of the
  * row's id, so (a) the sample is REPRODUCIBLE across runs, retries, and
  * engines (the DuckDB oracle draws the identical sample bit-for-bit),
  * and (b) re-running over a grown table keeps every previously-sampled
  * row's fate stable — the property that makes incremental pipeline
  * re-runs append-only. The unweighted form of the same idea is
  * `q_sample_hash` (R14); these add the weight dimension.
  *
  * Scale posture: `weightedBernoulli` is a pure per-row predicate — a
  * pushable filter, no shuffle, no state. `weightedReservoir` (A-ES) is
  * a global top-k on a computed priority — TakeOrderedAndProject, the
  * same O(k)-per-partition + driver-merge shape as q_top_orders, never a
  * global sort.
  */
object Sampling {
  /** 2⁴⁸ as a double — the hash48 range, exactly representable. */
  private val HashRangeD = Kmv.HashRange.toDouble

  /** Keep predicate for Bernoulli sampling with P(keep) = min(w, cap)/cap.
    *
    * Integer-exact cross-engine: hash48(id) is uniform on [0, 2⁴⁸); the
    * threshold `floor(2⁴⁸ · min(w, cap) / cap)` is computed with the same
    * IEEE-754 ops in the same order in both engines, so the comparison is
    * bit-reproducible (the product may round above 2⁵³ — identically on
    * both sides).
    */
  def weightedKeep(id: Column, weight: Column, cap: Double): Column = {
    // cap <= 0 would make the threshold NaN and silently sample nothing
    require(cap > 0, s"weightedKeep: cap must be positive, got $cap")
    Kmv.hash48(id) <
      floor(lit(HashRangeD) * least(weight.cast("double"), lit(cap)) / lit(cap))
  }

  /** Weighted Bernoulli sample: each row kept independently with
    * probability min(weight, cap)/cap. Expected sample weight-share is
    * proportional to the weight column — the "sample hot documents more"
    * curation primitive.
    */
  def weightedBernoulli(df: DataFrame, idCol: String, weightCol: String,
                        cap: Double): DataFrame =
    df.filter(weightedKeep(col(idCol), col(weightCol), cap))

  /** A-ES (Efraimidis–Spirakis) priority: u^(1/w) with u = (hash48+1)/2⁴⁸
    * ∈ (0, 1]. Taking the k largest priorities draws a weighted sample
    * WITHOUT replacement — inclusion probability follows successive
    * weighted draws. Floating-point (pow/division), so spec-verified
    * against a driver-side reference rather than oracle-gated; still
    * fully deterministic for a fixed table.
    */
  def aesPriority(id: Column, weight: Column): Column =
    pow((Kmv.hash48(id) + lit(1L)).cast("double") / lit(HashRangeD),
      lit(1.0) / weight.cast("double"))

  /** Weighted reservoir sample of size k (largest A-ES priorities).
    * Requires strictly positive weights (w ≤ 0 rows are dropped — their
    * priority would be 0 or undefined).
    */
  def weightedReservoir(df: DataFrame, idCol: String, weightCol: String,
                        k: Int): DataFrame = {
    require(k >= 1)
    df.filter(col(weightCol) > 0)
      .withColumn("__pri", aesPriority(col(idCol), col(weightCol)))
      .orderBy(col("__pri").desc, col(idCol))
      .limit(k)
      .drop("__pri")
  }

  /** R153: exact weighted bottom-k sample — the INTEGER sibling of
    * [[weightedReservoir]] that an oracle can replay bit-for-bit:
    * priority(row) = hash48(id) div w (Cohen–Kaplan weighted bottom-k
    * sketches, public literature — doubling the weight halves the
    * priority and so doubles the odds of landing in the bottom k), the
    * sample = the k smallest (priority, id). No pow, no division by a
    * float, one floor per row; inclusion probabilities follow the A-ES
    * shape up to integer flooring, which both engines share.
    *
    * Scale: a computed-column TakeOrderedAndProject — O(k) per
    * partition + driver merge, never a global sort. Weights must be
    * positive integers (≤ 0 dropped, stated — their priority is
    * unbounded/undefined).
    *
    * @return input columns + `priority`, the k winners
    */
  def weightedBottomK(df: DataFrame, idCol: String, weight: Column,
                      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.withColumn("__w", weight.cast("long"))
      .filter(col("__w") > 0)
      .withColumn("__h", Kmv.hash48(col(idCol)))
      .withColumn("priority", expr("__h div __w"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
      .drop("__w", "__h")
  }

  /** R154: deterministic bootstrap confidence interval for the mean —
    * the assumption-free CI, with the resampling RNG replaced by
    * hash48 so both engines draw the IDENTICAL B resamples:
    *
    *   draw(b, j)   = row at position hash48(grp:b:j) mod n + 1
    *                  (positions from the two-stage exact rank — a
    *                  stable total order; modulo bias ≤ n/2⁴⁸, stated)
    *   mean_b       = Σ draws div n        (floored, B per group)
    *   [ci_lo, ci_hi] = type-1 quantiles of the B means at the
    *                  requested ppm levels (index ⌈B·p⌉, min 1)
    *
    * Everything integer; the point mean ships alongside. Work is
    * n·B rows per group — one hash join back to the position table,
    * one (grp, b) aggregate, one B-sized window per group.
    *
    * @param b     number of bootstrap resamples
    * @param loPpm lower quantile in ppm (e.g. 25000 = 2.5%)
    * @param hiPpm upper quantile in ppm (e.g. 975000 = 97.5%)
    * @return (grp, n, mean_v, ci_lo, ci_hi) in the input's units
    */
  def bootstrapMeanCI(df: DataFrame, group: String, x: Column, id: Column,
                      b: Int, loPpm: Long, hiPpm: Long): DataFrame = {
    require(b >= 2, s"b must be >= 2, got $b")
    require(loPpm >= 1 && hiPpm <= 1000000 && loPpm < hiPpm,
      s"quantiles out of order: $loPpm, $hiPpm")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(group).cast("string").as("grp"),
        x.cast("long").as("v"), id.cast("long").as("id"))
      .filter(col("v").isNotNull)
    val pos = Ranking.rankExact(base, Seq("grp"), col("v"), Seq(col("id")),
        "pos")
      .withColumnRenamed("__total", "n")
    val bs = spark.range(1, b + 1).toDF("b")
    val draws = pos.select(col("grp"), col("pos").as("j"), col("n"))
      .crossJoin(broadcast(bs))
      .withColumn("idx",
        Kmv.hash48(concat_ws(":", col("grp"), col("b").cast("string"),
          col("j").cast("string"))) % col("n") + 1)
    val means = draws
      .join(pos.select(col("grp"), col("pos").as("idx"), col("v")),
        Seq("grp", "idx"))
      .groupBy(col("grp"), col("b"))
      .agg(sum(col("v")).as("__tot"), count(lit(1)).as("__nb"))
      .withColumn("mean_b", expr("__tot div __nb"))
    val loIdx = math.max(1L, math.ceil(b * loPpm / 1e6).toLong)
    val hiIdx = math.max(1L, math.ceil(b * hiPpm / 1e6).toLong)
    val w = Window.partitionBy(col("grp")).orderBy(col("mean_b"), col("b"))
    val ci = means.withColumn("__r", row_number().over(w))
      .groupBy(col("grp"))
      .agg(max(when(col("__r") === loIdx, col("mean_b"))).as("ci_lo"),
        max(when(col("__r") === hiIdx, col("mean_b"))).as("ci_hi"))
    base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("__s"))
      .withColumn("mean_v", expr("__s div n")).drop("__s")
      .join(ci, Seq("grp"))
  }

  /** R107: deterministic negative sampling — the training-pair
    * construction step for recommenders/retrievers: per user, up to `k`
    * items the user did NOT interact with, drawn by md5 hash so the
    * sample is reproducible, engine-agnostic, and stable under reruns
    * (no RNG state, no seed drift between runs). Draws that collide
    * with a positive are rejected (the anti-join), duplicate draws
    * collapse to their first attempt, and the first `k` surviving
    * attempts win — rejection can leave a user under `k` when attempts
    * run out, the documented trade for determinism.
    *
    * Scale shape: users × attempts explode (narrow), one anti-join
    * against positives on (user, item), one per-user window over ≤
    * `attempts` rows. Item ids are assumed dense in [1, max(item)]
    * (remap upstream otherwise — draws land uniformly over that range).
    * Draws take 48 md5 bits (12 hex chars), so every item up to the
    * 2⁴⁰ guard is reachable and the modulo bias is ≤ max(item)/2⁴⁸ —
    * below one draw in 250 even at the guard; a larger id space fails
    * loudly instead of silently skewing the sample toward low ids.
    *
    * @return (user_key, item, attempt) — negatives only
    */
  def negativeSample(positives: DataFrame, user: Column, item: Column,
                     attempts: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(attempts >= k && k >= 1, s"bad params (m=$attempts, k=$k)")
    val pos = positives.select(user.as("user_key"), item.as("item"))
      .distinct().ckpt
    val mx = pos.agg(max(col("item")).as("__mx"))
    val draw =
      conv(substring(md5(concat(col("user_key").cast("string"), lit(":"),
        col("attempt").cast("string"))), 1, 12), 16, 10).cast("long") %
        col("__mx") + 1
    val cands = pos.select(col("user_key")).distinct()
      .crossJoin(broadcast(mx))
      .select(col("user_key"), col("__mx"),
        explode(sequence(lit(0), lit(attempts - 1))).as("attempt"))
      .withColumn("item",
        when(col("__mx") > lit(1L << 40), raise_error(concat(
          lit("negativeSample: max(item) "), col("__mx").cast("string"),
          lit(" exceeds the 2^40 unbiased-draw guard — remap item ids"))))
          .otherwise(draw))
    val w = Window.partitionBy(col("user_key")).orderBy(col("attempt"))
    cands.join(pos, Seq("user_key", "item"), "left_anti")
      .groupBy(col("user_key"), col("item"))
      .agg(min(col("attempt")).as("attempt"))
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= k)
      .select(col("user_key"), col("item"), col("attempt"))
  }

  /** T24: training-mixture materialization — turn per-source TOKEN
    * budgets into a concrete document selection: within each source,
    * documents are taken in deterministic md5-of-id order until the
    * source's budget is met (the first document CROSSING the budget
    * boundary is included, so every source with any data meets its
    * budget; overshoot < one document). The step between "the mixture
    * spec says 30% web / 5% code" and an actual shard list — hash order
    * makes the selection reproducible, engine-agnostic, and stable
    * under reruns (the eval-set contract of hash sampling, applied to
    * mixture weights).
    *
    * Scale shape: one window per source (partitioned — sources are the
    * parallel unit), no global sort, no driver loop. Skewed sources
    * parallelize across their window partition only; at 100 TB the
    * per-source ordering is the same partitioned window every engine
    * runs for dedup keepers.
    *
    * @param docs   one row per document
    * @param source mixture-group column
    * @param id     document id (hash-order seed)
    * @param nTokens per-document token count
    * @param budgetTokens per-ROW budget for its source (join weights in
    *                     upstream; constant within a source)
    * @return input rows that made the cut, plus `cum_before` (tokens
    *         selected before this document in hash order)
    */
  def mixtureSelect(docs: DataFrame, source: Column, id: Column,
                    nTokens: Column, budgetTokens: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(source)
      .orderBy(md5(id.cast("string")), id)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("cum_before", coalesce(sum(nTokens).over(w), lit(0L)))
      .filter(col("cum_before") < budgetTokens)
  }

  /** T25: cap-and-redistribute mixture weights — the "no single domain
    * may exceed X% of training data" policy as integer waterfilling:
    * start from token-proportional shares; any source over the cap is
    * pinned AT the cap and its excess redistributes proportionally
    * among the uncapped — which can push NEW sources over, so the step
    * repeats for a fixed `iterations` (monotone: the capped set only
    * grows, so iterations ≥ #sources is the true fixpoint, and for any
    * count both engines compute identically — the [[graft.operators.Graph]]
    * fixed-round contract applied to weight solving).
    *
    * All arithmetic is integer (ppm, floor division): exact across
    * engines, no float shares. Fully declarative — per round one
    * two-value aggregate broadcast back over the per-source rows; no
    * driver loop over sources.
    *
    * @param perSource one row per source
    * @param source    source column
    * @param nTokens   per-source token mass
    * @param capPpm    ceiling per source, in ppm of the total
    * @return (source, n_tokens, w_ppm, capped) — Σ w_ppm ≤ 1e6 with
    *         only floor-truncation shortfall
    */
  /** Exact integer square root as a column: floor(sqrt(x)) computed via
    * float sqrt then corrected one step each way — IEEE sqrt is within
    * 1 ulp, so after floor the candidate is off by at most one; the two
    * integer-arithmetic corrections make the result EXACT for any
    * x < 2^52, independent of either engine's float rounding. The same
    * three-line correction is embeddable in the SQL oracle.
    */
  def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    val s1 = when((s0 + 1) * (s0 + 1) <= x, s0 + 1).otherwise(s0)
    when(s1 * s1 > x, s1 - 1).otherwise(s1)
  }

  /** T26: temperature-scaled mixture weights (α = 1/2) — the
    * multilingual-sampling upweighting (Conneau et al.: p_s ∝ n_s^α,
    * α < 1 lifts low-resource sources); with α = 1/2 the share is
    * isqrt-proportional and, via [[isqrt]], EXACT integer arithmetic in
    * both engines — the one α where temperature scaling needs no float
    * powers. One aggregate + one broadcast scalar.
    *
    * @return (source, n_tokens, w_ppm) with w_ppm = isqrt(n) · 1e6 div
    *         Σ isqrt(n)
    */
  def temperatureWeights(perSource: DataFrame, source: Column,
                         nTokens: Column): DataFrame = {
    val base = perSource.select(source.as("source"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("__r", isqrt(col("n_tokens")))
    val tot = base.agg(coalesce(sum(col("__r")), lit(0L)).as("__t"))
    base.crossJoin(broadcast(tot))
      .withColumn("w_ppm", when(col("__t") === 0, 0L)
        .otherwise(expr("__r * 1000000 div __t")))
      .drop("__r", "__t")
  }

  def capRedistribute(perSource: DataFrame, source: Column, nTokens: Column,
                      capPpm: Long, iterations: Int): DataFrame = {
    require(capPpm >= 1 && capPpm <= 1000000L, s"capPpm out of range: $capPpm")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    var cur = perSource.select(source.as("source"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("capped", lit(false))
      .withColumn("w_ppm", lit(0L))
    for (_ <- 1 to iterations) {
      val agg = cur.agg(
        coalesce(sum(when(!col("capped"), col("n_tokens"))), lit(0L))
          .as("__s"),
        coalesce(sum(when(col("capped"), lit(capPpm))), lit(0L))
          .as("__taken"))
      cur = cur.crossJoin(broadcast(agg))
        .withColumn("w_ppm", when(col("capped"), lit(capPpm))
          .otherwise(when(col("__s") === 0, lit(0L)).otherwise(
            expr(s"n_tokens * (1000000 - __taken) div __s"))))
        .withColumn("capped", col("capped") || col("w_ppm") > capPpm)
        .withColumn("w_ppm",
          when(col("w_ppm") > capPpm, lit(capPpm)).otherwise(col("w_ppm")))
        .drop("__s", "__taken")
    }
    cur
  }
}
