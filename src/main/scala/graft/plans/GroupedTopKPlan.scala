package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Native grouped top-k (custom-operator ladder step (c), building on the
  * typed-Aggregator form R34).
  *
  * Semantics: per group (equality `keys`), the k rows with the highest
  * `score` (ties broken by ascending `tie`, which must make the ordering
  * total), each with its 1-based rank appended.
  *
  * Physical shape — the aggregation template applied to row selection:
  *
  *   child → [TopKPruneExec: per-partition bounded buffers]
  *         → exchange on keys (inserted by EnsureRequirements)
  *         → [TopKFinalExec: merge + rank emit]
  *
  * The prune stage caps every partition's contribution at k rows per
  * group BEFORE the shuffle — the property that makes grouped top-k
  * viable when one group holds 10⁹ rows: shuffle volume is
  * O(partitions·groups·k), not O(rows), and no stage ever sorts a whole
  * group. The window formulation (row_number ≤ k) shuffles everything
  * and sorts every group in full; the Aggregator form gets the same
  * bound as this operator but pays ObjectHashAggregate's per-row
  * serialization of its List buffer. Here the buffers hold raw UnsafeRow
  * copies and emit them unchanged.
  */
case class GroupedTopKPlan(
    child: LogicalPlan,
    keys: Seq[Expression],
    score: Expression,
    tie: Expression,
    k: Int,
    rankAttr: AttributeReference) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKPlan =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: GroupedTopKPlan =>
      TopKFinalExec(
        TopKPruneExec(planLater(p.child), p.keys, p.score, p.tie, p.k),
        p.keys, p.score, p.tie, p.k, p.rankAttr) :: Nil
    case _ => Nil
  }
}

/** Per-group bounded buffer: rows kept sorted by (score desc, tie asc).
  * O(log k) reject for the common below-the-bar row, O(k) array move on
  * insert. Stores UnsafeRow copies (the input iterator reuses its row).
  */
private[plans] final class TopKBuffer(k: Int) {
  private val scores = new Array[Double](k)
  private val ties = new Array[Long](k)
  private val rows = new Array[UnsafeRow](k)
  private var n = 0

  def insert(score: Double, tie: Long, row: UnsafeRow): Unit = {
    // O(1) below-the-bar reject: once full, most offers in a heavy stream
    // lose to the current worst retained row — settle that with one
    // comparison instead of the binary search
    if (n == k) {
      val worst = n - 1
      if (scores(worst) > score || (scores(worst) == score && ties(worst) < tie))
        return
    }
    var lo = 0; var hi = n
    while (lo < hi) { // first slot whose (score,tie) sorts after the new row
      val mid = (lo + hi) >>> 1
      if (scores(mid) > score || (scores(mid) == score && ties(mid) < tie)) lo = mid + 1
      else hi = mid
    }
    if (lo >= k) return // below the bar
    val last = math.min(n, k - 1)
    var i = last
    while (i > lo) {
      scores(i) = scores(i - 1); ties(i) = ties(i - 1); rows(i) = rows(i - 1)
      i -= 1
    }
    scores(lo) = score; ties(lo) = tie; rows(lo) = row.copy()
    if (n < k) n += 1
  }

  def size: Int = n
  def rowAt(i: Int): UnsafeRow = rows(i)
  def scoreAt(i: Int): Double = scores(i)
  def tieAt(i: Int): Long = ties(i)
}

private[plans] object TopKBuffer {
  /** Shared scan loop: fill a per-key map of bounded buffers. Rows are
    * normalized to UnsafeRow (copies must survive the shuffle writer).
    * Score and tie are evaluated through a GENERATED projection (one
    * compiled (double, long) emit per row) rather than interpreted
    * Expression.eval — the per-row hot path of both stages.
    */
  def collect(iter: Iterator[InternalRow], keyProj: UnsafeProjection,
              scoreTieProj: UnsafeProjection, toUnsafe: UnsafeProjection,
              k: Int): java.util.LinkedHashMap[UnsafeRow, TopKBuffer] = {
    val map = new java.util.LinkedHashMap[UnsafeRow, TopKBuffer]()
    while (iter.hasNext) {
      val row = iter.next() match {
        case u: UnsafeRow => u
        case r => toUnsafe(r)
      }
      val key = keyProj(row)
      var buf = map.get(key)
      if (buf == null) {
        buf = new TopKBuffer(k)
        map.put(key.copy(), buf)
      }
      val st = scoreTieProj(row)
      // Parity with the window row_number form is claimed only for
      // non-null orderings; silently dropping a NULL (or uncastable)
      // score/tie would diverge from it invisibly, so fail loudly.
      if (st.isNullAt(0) || st.isNullAt(1))
        throw new IllegalArgumentException(
          "GroupedTopK: score and tie must be non-null and castable " +
            "(double/long); got a NULL at " + row)
      buf.insert(st.getDouble(0), st.getLong(1), row)
    }
    map
  }
}

/** Map-side prune: emits at most k rows per (group, partition), schema
  * unchanged. No required distribution — runs on whatever partitioning
  * the child has.
  */
case class TopKPruneExec(child: SparkPlan, keys: Seq[Expression],
                         score: Expression, tie: Expression, k: Int)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keys.map(
        BindReferences.bindReference(_, childOut)))
      val scoreTieProj = UnsafeProjection.create(
        Seq(score, tie).map(BindReferences.bindReference(_, childOut)))
      val toUnsafe = UnsafeProjection.create(childOut.map(_.dataType).toArray)
      val map = TopKBuffer.collect(iter, keyProj, scoreTieProj, toUnsafe, k)
      val groups = map.values().iterator()
      new Iterator[InternalRow] {
        private var buf: TopKBuffer = _
        private var i = 0
        override def hasNext: Boolean = {
          while ((buf == null || i >= buf.size) && groups.hasNext) {
            buf = groups.next(); i = 0
          }
          buf != null && i < buf.size
        }
        override def next(): InternalRow = { val r = buf.rowAt(i); i += 1; r }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPruneExec =
    copy(child = newChild)
}

/** Reduce side: same bounded merge after the exchange, emits rows with a
  * 1-based rank appended.
  */
case class TopKFinalExec(child: SparkPlan, keys: Seq[Expression],
                         score: Expression, tie: Expression, k: Int,
                         rankAttr: AttributeReference)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val outSchema = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keys.map(
        BindReferences.bindReference(_, childOut)))
      val scoreTieProj = UnsafeProjection.create(
        Seq(score, tie).map(BindReferences.bindReference(_, childOut)))
      val toUnsafe = UnsafeProjection.create(childOut.map(_.dataType).toArray)
      val map = TopKBuffer.collect(iter, keyProj, scoreTieProj, toUnsafe, k)
      val proj = UnsafeProjection.create(outSchema.map(_.dataType).toArray)
      val joined = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        outSchema.length)
      val groups = map.values().iterator()
      new Iterator[InternalRow] {
        private var buf: TopKBuffer = _
        private var i = 0
        override def hasNext: Boolean = {
          while ((buf == null || i >= buf.size) && groups.hasNext) {
            buf = groups.next(); i = 0
          }
          buf != null && i < buf.size
        }
        override def next(): InternalRow = {
          val r = buf.rowAt(i)
          var c = 0
          while (c < childOut.length) {
            joined.update(c, r.get(c, childOut(c).dataType)); c += 1
          }
          joined.update(childOut.length, (i + 1).toLong)
          i += 1
          proj(joined)
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}

/** DataFrame-level builder. */
object GroupedTopK {
  /** Top `k` rows per `keys` group by `score` descending (ties: `tie`
    * ascending, must be group-unique for determinism), with `rankName`
    * (bigint, 1-based) appended. `score` is evaluated as double, `tie`
    * as long; both must be NON-NULL and castable on every row (runtime
    * error otherwise — the window formulation this operator is
    * result-parity-checked against would rank NULLs, so they are
    * rejected rather than silently dropped).
    */
  def topK(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
           score: org.apache.spark.sql.Column, tie: org.apache.spark.sql.Column,
           k: Int, rankName: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(k >= 1)
    require(!df.columns.exists(c => c == "__score" || c == "__tie" || c == rankName),
      s"topK: input must not already contain __score/__tie/$rankName")
    val analyzed = df.select(
      (df.columns.map(org.apache.spark.sql.functions.col).toSeq :+
        score.cast("double").as("__score") :+ tie.cast("long").as("__tie")): _*)
      .queryExecution.analyzed
    def attr(n: String) = analyzed.output.find(_.name == n)
      .getOrElse(sys.error(s"column $n not found"))
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(GroupedTopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GroupedTopKStrategy
    val rank = AttributeReference(rankName, LongType, nullable = false)()
    val plan = GroupedTopKPlan(analyzed, keys.map(attr),
      attr("__score"), attr("__tie"), k, rank)
    ColumnBridge.ofRows(df.sparkSession, plan)
      .drop("__score", "__tie")
  }
}
