package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * ordering key <= (or <) the left row's key, per partition key.
  *
  * Spark has no built-in as-of join; a naive range-condition join explodes
  * into a cross product per key. This implementation uses the union+window
  * pattern: tag both sides, union, sort once per partition key, and carry the
  * last-seen right value forward with `last(..., ignoreNulls)` over an
  * unbounded-preceding frame. Cost: ONE shuffle of (left+right) on the
  * partition key — no cross product, no range explosion; at 100 TB this is
  * the same cost as any co-partitioned join of the two streams.
  */
object AsOfJoin {
  /** The custom-operator form: plans through [[graft.plans.AsOfJoinPlan]] →
    * AsOfJoinExec (one exchange + sort per side, then a forward merge scan
    * per partition). Same semantics as [[strictPrior]] with a single carried
    * column. Requires the session to carry GraftExtensions (for the planner
    * strategy).
    */
  def strictPriorNative(left: DataFrame, right: DataFrame, partition: String,
                        ordering: String, carrySrc: String, carryDst: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val la = left.queryExecution.analyzed
    // Both sides often scan the same table → identical exprIds on both
    // children. DeduplicateRelations renumbers the right subtree but cannot
    // know which of THIS node's expressions belong to the right side, so we
    // re-alias the right output with fresh exprIds up front and reference
    // only those.
    val ra0 = right.queryExecution.analyzed
    val aliases = ra0.output.map(a => Alias(a, a.name)())
    val ra = Project(aliases, ra0)
    val rAttr = aliases.map(al => al.name -> al.toAttribute).toMap
    def lAttr(n: String) = la.output.find(_.name == n)
      .getOrElse(sys.error(s"column $n not found in ${la.output.map(_.name)}"))
    def rOf(n: String) = rAttr.getOrElse(n,
      sys.error(s"column $n not found in ${rAttr.keys}"))
    // self-register the planner strategy (public API) so the operator works
    // in sessions built without GraftExtensions
    val exp = left.sparkSession.experimental
    if (!exp.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val out = AttributeReference(carryDst, rOf(carrySrc).dataType, nullable = true)()
    val plan = graft.plans.AsOfJoinPlan(la, ra,
      lAttr(partition), rOf(partition),
      lAttr(ordering), rOf(ordering), rOf(carrySrc), out)
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(left.sparkSession, plan)
  }

  /** @param left       probe side
    * @param right      reference side (values carried forward)
    * @param partition  equality key column name (both sides)
    * @param ordering   ordering column name (both sides); strict: right.ord < left.ord
    * @param carry      right-side columns to attach (renamed as given)
    */
  def strictPrior(left: DataFrame, right: DataFrame, partition: String, ordering: String,
                  carry: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
    val r0 = right.select(
      (Seq(col(partition), col(ordering), lit(0).as("__side")) ++
        carry.map { case (src, dst) => col(src).as(s"__c_$dst") }.toSeq): _*)
    // align schemas for union
    val lAligned = carry.values.foldLeft(l)((d, dst) => d.withColumn(s"__c_$dst", lit(null)))
      .select((Seq(col(partition), col(ordering), col("__side")) ++
        carry.values.map(dst => col(s"__c_$dst")).toSeq ++
        leftCols.filterNot(c => c == partition || c == ordering).map(col)): _*)
    val rAligned = leftCols.filterNot(c => c == partition || c == ordering)
      .foldLeft(r0)((d, c) => d.withColumn(c, lit(null)))
      .select(lAligned.columns.map(col): _*)
    val unioned = lAligned.unionByName(rAligned)
    val w = Window.partitionBy(partition)
      .orderBy(col(ordering), col("__side")) // right rows sort before left at equal ordering → strict "<" via -1 frame... see below
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCarry = carry.values.foldLeft(unioned) { (d, dst) =>
      d.withColumn(dst,
        last(when(col("__side") === 0, col(s"__c_$dst")), ignoreNulls = true).over(w))
    }
    withCarry.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ carry.values.map(col)): _*)
  }

  /** Forward as-of: attach the FIRST right row strictly after each left
    * row (right.ord > left.ord) per partition key — the "next quote
    * after the trade" / "next deploy after the alert" direction
    * [[strictPrior]] cannot express. Same union-and-window shape, frame
    * mirrored to (1, ∞); at equal ordering the right row sorts BEFORE
    * the left row, which places it outside the following frame — that
    * IS the strictness, no extra predicate.
    */
  def strictNext(left: DataFrame, right: DataFrame, partition: String, ordering: String,
                 carry: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
    val r0 = right.select(
      (Seq(col(partition), col(ordering), lit(0).as("__side")) ++
        carry.map { case (src, dst) => col(src).as(s"__c_$dst") }.toSeq): _*)
    val lAligned = carry.values.foldLeft(l)((d, dst) => d.withColumn(s"__c_$dst", lit(null)))
      .select((Seq(col(partition), col(ordering), col("__side")) ++
        carry.values.map(dst => col(s"__c_$dst")).toSeq ++
        leftCols.filterNot(c => c == partition || c == ordering).map(col)): _*)
    val rAligned = leftCols.filterNot(c => c == partition || c == ordering)
      .foldLeft(r0)((d, c) => d.withColumn(c, lit(null)))
      .select(lAligned.columns.map(col): _*)
    val unioned = lAligned.unionByName(rAligned)
    val w = Window.partitionBy(partition)
      .orderBy(col(ordering), col("__side"))
      .rowsBetween(1, Window.unboundedFollowing)
    val withCarry = carry.values.foldLeft(unioned) { (d, dst) =>
      d.withColumn(dst,
        first(when(col("__side") === 0, col(s"__c_$dst")), ignoreNulls = true).over(w))
    }
    withCarry.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ carry.values.map(col)): _*)
  }
}
