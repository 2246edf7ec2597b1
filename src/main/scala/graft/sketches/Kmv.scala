package graft.sketches

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the mergeable
  * theta-sketch family member whose entire state is the k smallest
  * DISTINCT hash values seen.
  *
  * Why it matters at 100 TB: exact COUNT(DISTINCT x) shuffles every
  * distinct value; approx_count_distinct is engine-private state you can
  * neither persist nor combine across runs. A KMV sketch is a k-long
  * sorted array that (a) partial-aggregates map-side like any sum,
  * (b) merges associatively across partitions, days, or tables (union →
  * keep k smallest), and (c) uses portable md5-derived hashing, so a
  * DuckDB oracle reproduces the estimate BIT-EXACTLY — no error-band
  * hand-waving in the gate (estimator variance ~1/√(k−2) still applies
  * to how close it lands to the truth; KmvSpec bounds that).
  *
  * Estimator: with fewer than k retained values the sketch has seen every
  * distinct hash — return the exact count. Otherwise the k-th smallest
  * hash h₍ₖ₎ of values uniform on [0, 2⁴⁸) estimates density:
  * n̂ = (k−1)·2⁴⁸ ÷ h₍ₖ₎, truncating integer division in both engines.
  *
  * Reference anchor: operational row-count stats (03_cdc_etl.py:203-216)
  * generalized to the cardinality statistics a replica's planner needs.
  */
object Kmv {
  /** Hash width: 48 bits = 12 hex chars of md5 — exact in a BIGINT/Long
    * and in DuckDB integer arithmetic (no sign games, no overflow in
    * (k−1)·2⁴⁸ for any sane k).
    */
  val HashBits = 48
  val HashRange: Long = 1L << HashBits

  /** Portable hash column: integer value of the first 12 hex chars of
    * md5(x) — uniform on [0, 2⁴⁸), identical in DuckDB.
    */
  def hash48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** Insert h into a sorted distinct k-bounded array. O(k) array copy
    * worst case, O(log k) no-op for the common below-the-bar row.
    */
  private[graft] def insert(buf: Array[Long], h: Long, k: Int): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) buf // already present
    else {
      val ins = -idx - 1
      if (buf.length >= k && ins >= k) buf // beyond the k-th smallest
      else {
        val n = math.min(k, buf.length + 1)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        if (ins < n - 1) System.arraycopy(buf, ins, out, ins + 1, n - 1 - ins)
        out
      }
    }
  }

  /** Merge two sorted distinct arrays, keeping the k smallest. */
  private[graft] def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (i < a.length && a(i) == v) i += 1 // cross-array duplicate
      if (j < b.length && b(j) == v) j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** The estimate from a sketch state. */
  private[graft] def estimate(buf: Array[Long], k: Int): Long =
    if (buf.length < k) buf.length.toLong
    else (k - 1).toLong * HashRange / buf(k - 1)

  /** Typed Aggregator over 48-bit hash values. Buffer = the sketch. */
  class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Long] {
    require(k >= 2, "k >= 2")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = union(a, b, k)
    override def finish(buf: Array[Long]): Long = estimate(buf, k)
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Long] = ExpressionEncoder()
  }

  /** DataFrame-API aggregate column: KMV distinct estimate of `hashCol`
    * (a hash48 column), usable inside any groupBy.agg alongside builtins.
    */
  def kmvDistinct(hashCol: Column, k: Int): Column =
    udaf(new KmvAgg(k)).apply(hashCol)

  /** Like [[KmvAgg]] but finishing to the RAW sorted sketch array — the
    * form set operations combine (a distinct estimate alone can't be
    * intersected; the retained hash values can).
    */
  class KmvSketchAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, "k >= 2")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = union(a, b, k)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Aggregate column: the sorted k-minimum-hash array itself. */
  def kmvSketch(hashCol: Column, k: Int): Column =
    udaf(new KmvSketchAgg(k)).apply(hashCol)

  /** KMV set operations between the value sets of two groups: union and
    * intersection cardinality estimates from the two sketches ALONE — the
    * sketch-algebra answer to "how many users do these segments share?"
    * without re-scanning either side (theta-sketch style).
    *
    * Estimator: merge the sketches and re-truncate to the k smallest —
    * a valid KMV of A∪B, whose estimate is `union_est`. The merged
    * support is a uniform sample of A∪B, so the fraction of it present
    * in BOTH input sketches estimates Jaccard; `inter_est` =
    * x_common·union_est ÷ k (integer division). With fewer than k
    * retained values everything degenerates to exact set math.
    *
    * All outputs are integers derived from md5-based hashing — the gate
    * reproduces them bit-exactly in DuckDB. Exact distinct counts ride
    * along for calibration (KmvSpec bounds the estimator error).
    */
  def setOpsReport(df: DataFrame, groupCol: String, valueCol: String,
                   gA: String, gB: String, k: Int): DataFrame = {
    val hashed = df.filter(col(groupCol).isin(gA, gB))
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
    val sk = hashed.select(col("g"), hash48(col("v")).as("h"))
      .groupBy("g").agg(kmvSketch(col("h"), k).as("sk"))
    val a = sk.filter(col("g") === gA).select(col("sk").as("sk_a"))
    val b = sk.filter(col("g") === gB).select(col("sk").as("sk_b"))
    val exact = hashed.distinct()
      .groupBy("v").agg(countDistinct(col("g")).as("ng"))
      .agg(count(lit(1)).as("exact_union"),
        sum(when(col("ng") === 2, 1L).otherwise(0L)).as("exact_inter"))
    a.crossJoin(b).crossJoin(exact)
      .withColumn("merged",
        slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k))
      .withColumn("m", size(col("merged")).cast("long"))
      .withColumn("union_est",
        when(col("m") < k, col("m")).otherwise(
          expr(s"${(k - 1).toLong * HashRange}L div element_at(merged, $k)")))
      .withColumn("x_common",
        size(array_intersect(col("merged"),
          array_intersect(col("sk_a"), col("sk_b")))).cast("long"))
      .withColumn("inter_est",
        when(col("m") < k, col("x_common"))
          .otherwise(expr(s"(x_common * union_est) div ${k}L")))
      .select(lit(gA).as("set_a"), lit(gB).as("set_b"),
        size(col("sk_a")).cast("long").as("n_a"),
        size(col("sk_b")).cast("long").as("n_b"),
        col("x_common"), col("union_est"), col("inter_est"),
        col("exact_union"), col("exact_inter"))
  }

  /** Gate-query shape: per-group exact distinct + KMV estimate of the
    * same hash stream, both reproducible in SQL. The pre-`distinct` here
    * exists solely so `n_exact` can sit beside the estimate for the
    * oracle — the production sketch path is
    * `df.groupBy(g).agg(kmvDistinct(hash48(v), k))` on RAW rows: no
    * distinct shuffle, map-side partial sketches, O(k) state per group.
    */
  def distinctReport(df: DataFrame, groupCol: String, valueCol: String, k: Int): DataFrame = {
    val hashed = df.select(col(groupCol), hash48(col(valueCol)).as("h")).distinct()
    hashed.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_exact"),
        kmvDistinct(col("h"), k).as("kmv_est"))
      .orderBy(col(groupCol))
  }

  /** Per-day retention curves from the per-day KMV states ALONE — for
    * every cohort day c and horizon d ∈ [0, maxOffset], the estimated
    * fraction (ppm) of day-c actives still active on day c+d, without
    * touching a single raw event row. This is the payoff of persisting
    * the day sketches (the state [[graft.streaming.Streams.streamingDayKmv]]
    * drains): day-over-day retention across a year of 100 TB logs becomes
    * arithmetic over 365 k-long arrays.
    *
    * Estimator per pair (the [[setOpsReport]] algebra): merge the two day
    * sketches and re-truncate to the k smallest — a valid KMV of
    * A∪B → `union_est`; the merged support is a uniform sample of A∪B,
    * so the fraction of it present in BOTH inputs estimates Jaccard:
    * inter_est = x_common·union_est ÷ k. Then
    * ret_ppm = inter_est·10⁶ ÷ cohort_est, every division truncating
    * integer, the product widened through DECIMAL(38,0) — bit-exact in
    * the DuckDB oracle. Below-k days degenerate to exact set math, and
    * the d = 0 diagonal lands on exactly 1 000 000 (merged ≡ cohort
    * sketch) — a built-in calibration row.
    *
    * Plan shape: the pair fan-out is the bounded explode of [[graft
    * .operators.Cohorts.rollingDistinct]] (each day emits ≤ maxOffset+1
    * probes, never a range self-join), and the sketch table — one row per
    * day — broadcasts into its own probe join.
    *
    * @param daySketches (day: long, sk: array<long>) — one KMV sketch of
    *                    the day's active keys per day, from [[kmvSketch]]
    *                    or the streaming day-KMV state
    * @param k           the sketch parameter the inputs were built with
    * @param maxOffset   largest horizon d to report
    * @return (day, offset_d, cohort_est, inter_est, ret_ppm), one row per
    *         (cohort day, horizon) pair whose target day exists
    */
  def retentionFromDaySketches(daySketches: DataFrame, k: Int,
                               maxOffset: Int): DataFrame = {
    require(k >= 2, "k >= 2")
    require(maxOffset >= 0, s"maxOffset must be >= 0, got $maxOffset")
    val c = (k - 1).toLong * HashRange
    val target = daySketches
      .select(col("day").as("target_day"), col("sk").as("sk_b"))
    daySketches
      .select(col("day"), col("sk").as("sk_a"),
        explode(sequence(lit(0), lit(maxOffset))).as("offset_d"))
      .withColumn("target_day", col("day") + col("offset_d"))
      .join(broadcast(target), Seq("target_day"))
      .withColumn("merged",
        slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k))
      .withColumn("m", size(col("merged")).cast("long"))
      .withColumn("m_a", size(col("sk_a")).cast("long"))
      .withColumn("cohort_est",
        when(col("m_a") < k, col("m_a"))
          .otherwise(expr(s"${c}L div element_at(sk_a, $k)")))
      .withColumn("union_est",
        when(col("m") < k, col("m"))
          .otherwise(expr(s"${c}L div element_at(merged, $k)")))
      .withColumn("x_common",
        size(array_intersect(col("merged"),
          array_intersect(col("sk_a"), col("sk_b")))).cast("long"))
      .withColumn("inter_est",
        when(col("m") < k, col("x_common"))
          .otherwise(expr(s"(x_common * union_est) div ${k}L")))
      .withColumn("ret_ppm",
        expr("CAST(CAST(inter_est AS DECIMAL(38,0)) * 1000000" +
          " div cohort_est AS BIGINT)"))
      .select(col("day"), col("offset_d").cast("long").as("offset_d"),
        col("cohort_est"), col("inter_est"), col("ret_ppm"))
  }
}
