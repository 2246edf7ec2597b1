package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator as-of join (SURVEY §2.2 R13, custom-operator ladder
  * step (c): LogicalPlan + Strategy + SparkPlan).
  *
  * Semantics: for each left row, attach `carry` from the most recent right
  * row with the same key and ordering value strictly below the left row's
  * (null if none) — "the last click before this purchase".
  *
  * Keys/ordering/carry are Expression fields (not names) so every optimizer
  * rule that rewrites child attributes (alias removal, dedup-relations,
  * pruning) rewrites them through the standard mapExpressions machinery.
  * `outAttr` is produced by this node and declared via producedAttributes.
  *
  * Physical shape: both sides hash-distributed on the key and sorted by
  * (key, ordering) — one exchange per side at most, satisfied for free if
  * the inputs are already co-partitioned (e.g. bucketed event tables). Then
  * a single forward merge scan per partition: O(n_left + n_right), one
  * carried value of state, no range-join explosion, no union
  * materialization (beats the window formulation in operators/AsOfJoin).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftOrd: Expression,
    rightOrd: Expression,
    carry: Expression,
    outAttr: AttributeReference) extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.rightKey, p.leftOrd, p.rightOrd, p.carry, p.outAttr) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftOrd: Expression,
    rightOrd: Expression,
    carry: Expression,
    outAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftOrd, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightOrd, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val keyType = leftKey.dataType
    val ordType = leftOrd.dataType
    val carryType = carry.dataType
    val outSchema = output
    val lKeyB = BindReferences.bindReference(leftKey, lOut)
    val lOrdB = BindReferences.bindReference(leftOrd, lOut)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rOrdB = BindReferences.bindReference(rightOrd, right.output)
    val carryB = BindReferences.bindReference(carry, right.output)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outSchema.map(_.dataType).toArray)
      val joined = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        outSchema.length)
      val keyCmp = org.apache.spark.sql.catalyst.types.PhysicalDataType.ordering(keyType)
        .asInstanceOf[Ordering[Any]]
      val ordCmp = org.apache.spark.sql.catalyst.types.PhysicalDataType.ordering(ordType)
        .asInstanceOf[Ordering[Any]]

      val rBuf = rIter.buffered
      var curKey: Any = null
      var haveKey = false
      var lastCarry: Any = null

      lIter.map { lRow =>
        val k = lKeyB.eval(lRow)
        val o = lOrdB.eval(lRow)
        if (!haveKey || keyCmp.compare(curKey, k) != 0) {
          curKey = k; haveKey = true; lastCarry = null
        }
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rRow = rBuf.head
          val rk = rKeyB.eval(rRow)
          val kc = keyCmp.compare(rk, k)
          if (kc < 0) { rBuf.next() } // behind on key: discard
          else if (kc == 0 && ordCmp.compare(rOrdB.eval(rRow), o) < 0) {
            lastCarry = carryB.eval(rRow) match {
              case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
              case v => v
            }
            rBuf.next()
          } else advancing = false
        }
        var i = 0
        while (i < lOut.length) { joined.update(i, lRow.get(i, lOut(i).dataType)); i += 1 }
        joined.update(lOut.length, lastCarry)
        proj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
