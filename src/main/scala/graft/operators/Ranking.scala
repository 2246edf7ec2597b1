package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact ranking — NTILE and global row ranks over a total
  * order WITHOUT the single-partition data-sized window sort that
  * `Window.orderBy(...)` (no partition key) plans.
  *
  * The two-stage scan (the [[PrefixSum]] posture applied to ranks):
  *   1. coarsen the numeric order key into ≤ `buckets`+1 range buckets
  *      (width from a broadcast min/max — pure column arithmetic, no
  *      driver round-trip); bucket order is monotone in the key order,
  *      so global rank = bucket offset + intra-bucket rank;
  *   2. per-(group, bucket) row counts — one hash aggregate;
  *   3. exclusive-prefix the BUCKET COUNTS per group (the only window
  *      whose partition can be empty, and it runs over ≤ buckets+1
  *      metadata rows per group, never data) → each bucket's offset and
  *      its group's total N;
  *   4. intra-bucket `row_number` partitioned BY (group, bucket) — the
  *      data-sized sort is always partitioned.
  *
  * NTILE(n) then follows from (rank, N) in closed form with the exact
  * SQL-standard fill (first N mod n buckets take one extra row), so the
  * result is bit-identical to a single-partition NTILE while every
  * data-sized operation stays parallel.
  *
  * Value skew caveat: rows with equal order-key values land in one range
  * bucket, so a single value holding most of the data bounds parallelism
  * by that bucket (never worse than the global window this replaces).
  */
object Ranking {
  /** Append exact 1-based NTILE bucket `out` over the total order
    * (`value`, `tieBreaks`…) within each `group` (empty = global).
    *
    * @param value     numeric primary order key (cast to long; the cast
    *                  must preserve order — pre-scale decimals)
    * @param tieBreaks completes the total order so assignment is
    *                  deterministic and engine-identical
    * @param buckets   range-bucket budget; the metadata table stage 3
    *                  windows over is ≤ buckets+1 rows per group
    */
  def ntileExact(df: DataFrame, group: Seq[String], value: Column,
                 tieBreaks: Seq[Column], n: Int, out: String,
                 buckets: Int = 4096): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val ranked = rankExact(df, group, value, tieBreaks, "__rank", buckets)
    ranked
      .withColumn("__q", expr(s"__total div $n"))
      .withColumn("__r", expr(s"__total % $n"))
      .withColumn("__thr", expr("__r * (__q + 1)"))
      .withColumn(out, expr(
        """CASE WHEN __rank <= __thr THEN (__rank + __q) div (__q + 1)
          |ELSE __r + ((__rank - __thr + __q - 1) div __q) END""".stripMargin))
      .drop("__rank", "__total", "__q", "__r", "__thr")
  }

  /** Append the exact 1-based rank `out` over the total order (`value`,
    * `tieBreaks`…) within each `group`, plus the group row count as
    * `__total` (callers drop it). See object doc for the decomposition.
    */
  def rankExact(df: DataFrame, group: Seq[String], value: Column,
                tieBreaks: Seq[Column], out: String,
                buckets: Int = 4096): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val gcols = group.map(col)
    val base = df.withColumn("__v", value.cast("long"))
    val stats = base.agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    val bucketed = base.crossJoin(broadcast(stats))
      .withColumn("__bkt",
        expr(s"(__v - __mn) div greatest(1L, (__mx - __mn) div $buckets + 1)"))
      .drop("__mn", "__mx")
    val counts = bucketed.groupBy(gcols :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__c"))
    // per-group bucket-count table: ≤ buckets+1 rows per group (metadata)
    val wOff = Window.partitionBy(gcols: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gcols: _*)
    val offsets = counts.select(
      (gcols :+ col("__bkt")) ++ Seq(
        coalesce(sum(col("__c")).over(wOff), lit(0L)).as("__off"),
        sum(col("__c")).over(wTot).as("__total")): _*)
    // metadata-sized when group is empty; grouped offsets co-partition on
    // the join key, so let AQE pick the join strategy there
    val offsetsSide = if (group.isEmpty) broadcast(offsets) else offsets
    val wIntra = Window.partitionBy(gcols :+ col("__bkt"): _*)
      .orderBy(col("__v") +: tieBreaks: _*)
    bucketed.join(offsetsSide, group :+ "__bkt")
      .withColumn(out, col("__off") + row_number().over(wIntra))
      .drop("__v", "__bkt", "__off")
  }

  /** R152: Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009) —
    * the standard zero-training rank-ensemble: each input ranking
    * contributes 10⁶ div (k + rank) per candidate (floored per term,
    * so the fused score is an exact sum of integers both engines
    * replay), candidates missing from a list contribute nothing, and
    * the fused list re-ranks by (score desc, cand_id). k dampens the
    * head (the canonical 60 keeps rank-1 vs rank-2 differences from
    * dominating).
    *
    * Lists are k-bounded per query by construction, so the union, the
    * (query, cand) sum and the per-query re-rank window are all
    * list-sized — nothing data-sized anywhere.
    *
    * @param rankings (query_id, cand_id, rnk) frames, rnk 1-based
    * @param k        RRF dampening constant (≥ 1)
    * @param topN     fused candidates kept per query
    * @return (query_id, cand_id, rrf_ppm, n_lists, rnk)
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Long, topN: Int): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking required")
    require(k >= 1, s"k must be >= 1, got $k")
    val scored = rankings.map(
      _.select(col("query_id"), col("cand_id"),
        expr(s"1000000 div ($k + rnk)").as("__s")))
      .reduce(_ unionAll _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_ppm").desc, col("cand_id"))
    scored.groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("__s")).as("rrf_ppm"), count(lit(1)).as("n_lists"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topN)
  }

  /** Cross-group quantile normalization: replace each row's value with
    * the POOLED value at its within-group quantile, so every group's
    * distribution maps onto the common one — the standard fix before
    * mixing quality scores from heterogeneous sources (a "7" from a
    * lenient scorer and a "7" from a strict one stop meaning different
    * things). Type-1 (no interpolation) and exactly integer: a row at
    * within-group rank r of n (total order (value, id)) takes the pooled
    * value at rank ⌈r·N/n⌉ = (r·N + n − 1) div n — always in [1, N],
    * always an ACTUAL pooled value. Headroom: r·N must fit a long —
    * N ≲ 3·10⁹ rows; shard the pool first beyond that (stated).
    *
    * Both rank passes run through [[rankExact]] (two-stage bucket rank —
    * no data-sized single-partition sort); the lookup is one equi-join
    * on the pooled rank. Output: input columns + `norm` = the normalized
    * value.
    */
  def quantileNormalize(df: DataFrame, group: Seq[String], value: Column,
                        id: Column): DataFrame = {
    val ranked = rankExact(df, group, value, Seq(id), "__r")
      .withColumnRenamed("__total", "__n")
    val pooled = rankExact(df.select(value.as("__pv"), id.as("__pid")),
        Seq.empty, col("__pv"), Seq(col("__pid")), "__q")
      .select(col("__q"), col("__pv"))
    val nTotal = pooled.count()
    ranked
      .withColumn("__idx",
        expr(s"(__r * ${nTotal}L + __n - 1) div __n"))
      .join(pooled, col("__idx") === col("__q"))
      .withColumn("norm", col("__pv").cast("long"))
      .drop("__r", "__n", "__idx", "__q", "__pv")
  }

  /** Robust location pair: trimmed and winsorized means per group, in
    * one pass over the exact rank table. k = n·trimPpm div 10⁶ rows come
    * off EACH tail; the trimmed mean averages the inner n−2k rows, the
    * winsorized mean CLAMPS each tail to the inner boundary values
    * (inner_sum + k·lo + k·hi over n) — outlier-proof without discarding
    * mass. Means are sign-carried integer divisions (floor ≡ trunc on
    * the nonneg magnitude); a group trimmed empty (2k ≥ n) reports NULL
    * means — the honest answer, not a fallback.
    *
    * Rank via [[rankExact]] (two-stage — no data-sized single-partition
    * sort); everything after is ONE hash aggregate with conditional
    * sums, no join back.
    *
    * Output: group cols + (n, trim_mean, winsor_mean).
    */
  def trimmedWinsorizedMean(df: DataFrame, group: Seq[String],
                            value: Column, id: Column,
                            trimPpm: Long): DataFrame = {
    require(trimPpm >= 0 && trimPpm < 500000,
      s"trimPpm must be in [0, 500000), got $trimPpm")
    val base = df.withColumn("__val", value.cast("long"))
    val ranked = rankExact(base, group, col("__val"), Seq(id), "__r")
      .withColumn("__k", expr(s"__total * $trimPpm div 1000000"))
    val inner = col("__r") > col("__k") &&
      col("__r") <= col("__total") - col("__k")
    ranked.groupBy(group.map(col): _*)
      .agg(max(col("__total")).as("n"), max(col("__k")).as("k"),
        sum(when(inner, col("__val"))).as("si"),
        count(when(inner, lit(1))).as("ni"),
        max(when(col("__r") === col("__k") + 1, col("__val"))).as("lo_v"),
        max(when(col("__r") === col("__total") - col("__k"), col("__val")))
          .as("hi_v"))
      .withColumn("__ws", col("si") + col("k") * col("lo_v") +
        col("k") * col("hi_v"))
      .select((group.map(col) :+ col("n") :+
        expr("""CASE WHEN ni > 0 THEN
               |  CASE WHEN si >= 0 THEN si div ni ELSE -((-si) div ni) END
               |END""".stripMargin).as("trim_mean") :+
        expr("""CASE WHEN ni > 0 THEN
               |  CASE WHEN __ws >= 0 THEN __ws div n ELSE -((-__ws) div n) END
               |END""".stripMargin).as("winsor_mean")): _*)
  }
}
