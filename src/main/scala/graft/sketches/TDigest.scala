package graft.sketches

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Merging t-digest — mergeable approximate quantiles with accuracy
  * concentrated at the tails (Dunning & Ertl's MergingDigest design,
  * re-implemented from the published algorithm).
  *
  * Why not percentile_approx: Spark's builtin is fine inside one query,
  * but a digest you can PERSIST per partition/day and merge later is what
  * an incremental 100 TB pipeline needs — quantiles of the whole corpus
  * from per-shard digests without re-reading the data. State is
  * O(compression) centroids regardless of input size; reduce buffers raw
  * values and amortizes sort+merge; merge concatenates centroid lists and
  * recompresses.
  *
  * Scale function: k₁(q) = (δ/2π)·asin(2q−1). A centroid may absorb
  * weight while k₁(q_right) − k₁(q_left) ≤ 1, which caps centroid width
  * at O(√(q(1−q))/δ) — tight at the tails, loose in the middle, giving
  * the characteristic relative-rank-error guarantee ~O(1/δ) at p50 and
  * far better at p99.
  */
object TDigest {
  /** Digest state: parallel centroid arrays (sorted by mean) + raw-value
    * buffer awaiting compression (`nBuf` = filled prefix of `buf`, so
    * appends are in-place amortized O(1), not a copy per row). Weights
    * are Long so a 10¹² -row digest doesn't saturate.
    */
  case class State(means: Array[Double], weights: Array[Long],
                   buf: Array[Double], nBuf: Int)

  object State {
    val empty: State =
      State(Array.emptyDoubleArray, Array.emptyLongArray, Array.emptyDoubleArray, 0)
  }

  private val BufLimit = 512

  private def k1(q: Double, compression: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * q - 1.0)

  /** Sort-merge (centroids + buffered raw values) and greedily re-cluster
    * under the k₁ size bound.
    */
  def compress(st: State, compression: Double): State = {
    val n = st.means.length + st.nBuf
    if (n == 0) return st
    // gather (mean, weight) pairs: centroids + unit-weight buffer values
    val ms = new Array[Double](n); val ws = new Array[Long](n)
    System.arraycopy(st.means, 0, ms, 0, st.means.length)
    System.arraycopy(st.weights, 0, ws, 0, st.weights.length)
    var i = st.means.length
    var j = 0
    while (j < st.nBuf) { ms(i) = st.buf(j); ws(i) = 1L; i += 1; j += 1 }
    // sort by mean (indices via sorted permutation)
    val order = Array.range(0, n).sortBy(ms(_))
    val total = ws.sum.toDouble
    val outM = new Array[Double](n); val outW = new Array[Long](n)
    var out = -1
    var wSoFar = 0L
    var qLeft = 0.0
    order.foreach { idx =>
      val m = ms(idx); val w = ws(idx)
      val qRight = (wSoFar + w) / total
      if (out >= 0 && k1(qRight, compression) - k1(qLeft, compression) <= 1.0) {
        // absorb into current centroid (weighted running mean)
        val nw = outW(out) + w
        outM(out) = outM(out) + (m - outM(out)) * w / nw
        outW(out) = nw
      } else {
        out += 1
        outM(out) = m; outW(out) = w
        qLeft = wSoFar / total
      }
      wSoFar += w
    }
    State(java.util.Arrays.copyOf(outM, out + 1),
      java.util.Arrays.copyOf(outW, out + 1), Array.emptyDoubleArray, 0)
  }

  /** Quantile estimate by linear interpolation between centroid means,
    * treating each centroid as centered at its cumulative-weight midpoint.
    */
  def quantile(st: State, q: Double, compression: Double = 200): Double = {
    val c = if (st.nBuf > 0) compress(st, compression) else st
    val k = c.means.length
    if (k == 0) return Double.NaN
    if (k == 1) return c.means(0)
    val total = c.weights.sum.toDouble
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < k) {
      val mid = cum + c.weights(i) / 2.0
      if (target < mid) {
        if (i == 0) return c.means(0)
        val prevMid = cum - c.weights(i - 1) / 2.0
        val f = (target - prevMid) / (mid - prevMid)
        return c.means(i - 1) + f * (c.means(i) - c.means(i - 1))
      }
      cum += c.weights(i)
      i += 1
    }
    c.means(k - 1)
  }

  /** Typed Aggregator producing quantile estimates at the given probes. */
  class TDigestAgg(qs: Seq[Double], compression: Double = 200)
      extends Aggregator[Double, State, Seq[Double]] {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1))
    override def zero: State = State.empty
    override def reduce(st: State, v: Double): State = {
      // the buffer array is exclusively owned by this group's live state,
      // so fill it in place; grow geometrically when full
      val buf =
        if (st.nBuf < st.buf.length) st.buf
        else java.util.Arrays.copyOf(st.buf, math.max(32, st.buf.length * 2))
      buf(st.nBuf) = v
      val grown = State(st.means, st.weights, buf, st.nBuf + 1)
      if (grown.nBuf >= BufLimit) compress(grown, compression) else grown
    }
    override def merge(a: State, b: State): State =
      compress(State(a.means ++ b.means, a.weights ++ b.weights,
        java.util.Arrays.copyOf(a.buf, a.nBuf) ++ java.util.Arrays.copyOf(b.buf, b.nBuf),
        a.nBuf + b.nBuf), compression)
    override def finish(st: State): Seq[Double] =
      qs.map(q => quantile(st, q, compression))
    override def bufferEncoder: Encoder[State] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** DataFrame-API aggregate column over a double column. */
  def quantiles(c: Column, qs: Seq[Double], compression: Double = 200): Column =
    udaf(new TDigestAgg(qs, compression)).apply(c)

  /** Like [[TDigestAgg]] but finishing to the compressed STATE — the
    * persistable form: O(δ) centroids per group that a later run reads
    * back and merges with fresh data (incremental maintenance, the R44
    * pattern applied to quantiles).
    */
  class SketchAgg(compression: Double = 200)
      extends Aggregator[Double, State, State] {
    private val inner = new TDigestAgg(Seq(0.5), compression)
    override def zero: State = State.empty
    override def reduce(st: State, v: Double): State = inner.reduce(st, v)
    override def merge(a: State, b: State): State = inner.merge(a, b)
    override def finish(st: State): State = compress(st, compression)
    override def bufferEncoder: Encoder[State] = ExpressionEncoder()
    override def outputEncoder: Encoder[State] = ExpressionEncoder()
  }

  /** Aggregate column: the compressed digest state as a struct. */
  def digestState(c: Column, compression: Double = 200): Column =
    udaf(new SketchAgg(compression)).apply(c)

  /** Merge persisted digest STATES (struct rows from [[digestState]])
    * and finish to quantile estimates — how stored per-partition/per-day
    * digests combine into current quantiles without re-reading history.
    */
  class MergeQuantilesAgg(qs: Seq[Double], compression: Double = 200)
      extends Aggregator[State, State, Seq[Double]] {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1))
    private val inner = new TDigestAgg(qs, compression)
    override def zero: State = State.empty
    override def reduce(st: State, in: State): State = inner.merge(st, in)
    override def merge(a: State, b: State): State = inner.merge(a, b)
    override def finish(st: State): Seq[Double] = inner.finish(st)
    override def bufferEncoder: Encoder[State] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** The Aggregator input encoder flattens the State case class to one
    * argument per field, so the struct column is passed field-wise.
    */
  def mergeQuantiles(stateCol: Column, qs: Seq[Double],
                     compression: Double = 200): Column =
    udaf(new MergeQuantilesAgg(qs, compression)).apply(
      stateCol.getField("means"), stateCol.getField("weights"),
      stateCol.getField("buf"), stateCol.getField("nBuf"))
}
