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
  private[sketches] def insert(buf: Array[Long], h: Long, k: Int): Array[Long] = {
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
  private[sketches] def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
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
  private[sketches] def estimate(buf: Array[Long], k: Int): Long =
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
}
