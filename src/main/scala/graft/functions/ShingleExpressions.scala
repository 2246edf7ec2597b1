package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle builders. The builtin formulation
  * (transform(sequence(...), i => ...) + filter) is an interpreted
  * higher-order-function tree evaluated per element — these run one plain
  * JVM loop per row and keep the stage whole-stage-compiled. Semantics are
  * identical to the TextFunctions builtin forms (asserted in spec), so the
  * external oracles never change.
  */
object ShingleExpressions {
  /** Character n-grams at every position (codepoint-aware), positions
    * 1..numChars-n+1; empty below n chars.
    */
  def char_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(CharShinglesExpr(ColumnBridge.expression(text), n))

  /** Word n-grams of the single-space token stream (split " ", -1),
    * n consecutive tokens joined by one space; empty below n tokens.
    */
  def word_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(text), n))

  def charShingleData(u: UTF8String, n: Int): ArrayData = {
    val len = u.numChars()
    val count = math.max(0, len - n + 1)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = u.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  def wordShingleData(u: UTF8String, n: Int): ArrayData = {
    val parts = u.toString.split(" ", -1)
    val count = math.max(0, parts.length - n + 1)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(parts(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

abstract class ShingleExpr extends UnaryExpression {
  def n: Int
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = {
    require(n >= 1, "shingle size must be >= 1")
    require(child.dataType == StringType, s"needs string, got ${child.dataType}")
    super.checkInputDataTypes()
  }
  protected def helperName: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleExpressions.$helperName($c, $n);")
}

case class CharShinglesExpr(child: Expression, n: Int) extends ShingleExpr {
  override def nullSafeEval(v: Any): Any =
    ShingleExpressions.charShingleData(v.asInstanceOf[UTF8String], n)
  override protected def helperName: String = "charShingleData"
  override protected def withNewChildInternal(newChild: Expression): CharShinglesExpr =
    copy(child = newChild)
}

case class WordShinglesExpr(child: Expression, n: Int) extends ShingleExpr {
  override def nullSafeEval(v: Any): Any =
    ShingleExpressions.wordShingleData(v.asInstanceOf[UTF8String], n)
  override protected def helperName: String = "wordShingleData"
  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}
