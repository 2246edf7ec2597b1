package graft.layout

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Hilbert-curve clustering key — the locality-tighter sibling of Z-order.
  *
  * Both map (x, y) to a 1-D key so range-partitioned files own bounded
  * rectangles of key space, but the Morton curve jumps across the plane
  * at every power-of-two boundary (the z-shape diagonal), while the
  * Hilbert curve is CONTINUOUS: consecutive keys are always grid
  * neighbors. For file layout that means a file's rows sit in one compact
  * blob instead of up to four disjoint quadrant slices, so per-file
  * min/max boxes are tighter and a 2-D range predicate reads fewer files
  * (HilbertSpec measures the box-area ratio against Z-order on the same
  * data; Delta Lake's OPTIMIZE switched its default to Hilbert for the
  * same reason).
  *
  * The index is computed by a native codegen expression (one generated
  * loop over bit levels, like [[ZValue]]) — `bits` iterations of
  * quadrant-classify + rotate, all long arithmetic, inside whole-stage
  * codegen. The DuckDB oracle reproduces the identical walk as a
  * recursive CTE over the same integer ops, so the gate is hash-exact.
  *
  * Reference anchor: the reference pipeline materializes replicas ordered
  * by PK only (04_validate_data.py:15-24 reads back by primary key);
  * multi-dimensional layout is the lakehouse upgrade of that ordering
  * choice, added per the 100 TB mandate.
  */
object Hilbert {
  /** Hilbert d-index of the cell (x, y) on the 2^bits × 2^bits grid. */
  def hvalue(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(
      HilbertIndex(ColumnBridge.expression(x), ColumnBridge.expression(y), bits))

  /** Reference implementation (specs + oracle-derivation documentation).
    * Standard xy2d: walk bit planes high→low; at each scale classify the
    * quadrant (Gray-coded 0..3), accumulate s²·quad, rotate/reflect the
    * frame so the child quadrant is re-oriented to the canonical U.
    */
  def hvalueRef(x: Long, y: Long, bits: Int): Long = {
    require(x >= 0 && y >= 0, s"hvalue: negative input ($x, $y)")
    var xx = x; var yy = y
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((xx & s) > 0) 1L else 0L
      val ry = if ((yy & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { xx = s - 1 - xx; yy = s - 1 - yy }
        val t = xx; xx = yy; yy = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert index of the low `bits` bits of two non-negative longs.
  * Negative inputs are rejected at eval time, like [[ZValue]].
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits in [1,31]")
  override def dataType: DataType = LongType

  override def checkInputDataTypes() = {
    require(left.dataType == LongType && right.dataType == LongType,
      s"hvalue needs (bigint, bigint), got ${left.dataType} / ${right.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.hvalueRef(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |if ($a < 0L || $b < 0L) {
         |  throw new IllegalArgumentException("hvalue: negative input");
         |}
         |long $x = $a; long $y = $b;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
