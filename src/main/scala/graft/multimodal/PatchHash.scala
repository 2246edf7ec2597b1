package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** M9: pixel-level perceptual hashing — the first PIXEL operator on the
  * multimodal path (M1–M8 stop at container headers, the stated design;
  * the r6 verdict named patch hashing for image dedup as the next real
  * ask). The classic average hash (aHash): an 8×8 grayscale thumbnail,
  * mean-threshold each pixel, pack the 64 bits row-major into an int64;
  * near-duplicate images land within a small Hamming distance.
  *
  * The DECODE step (image bytes → 8×8 luma patch) is the stubbed stage:
  * this container ships no image codecs, so gates synthesize payloads
  * whose patch bytes are a deterministic function of the row id, and
  * "decode" is a byte slice (in production it is a `mapInPandas` batch
  * decode; the Spark-side plumbing — binary column in, int64 hash out,
  * banded self-join — is identical and is what's tested). Everything
  * AFTER decode is real and exact:
  *
  *  - [[ahash]] is a native codegen'd Expression — one static call per
  *    row inside whole-stage codegen, no UDF, no RDD round-trip;
  *  - bit 63 rides the sign bit (plain two's complement) so the SQL
  *    oracle reproduces the exact long with one HUGEINT fold;
  *  - the near-dup join is BANDED (4 × 16-bit bands): pigeonhole says
  *    any pair within Hamming ≤ 3 shares at least one exact band, so
  *    candidates come from 4 equi-joins — never an all-pairs scan —
  *    and `bit_count(a ^ b)` (builtin, codegen'd) verifies exactly.
  */
object PatchHash {

  /** 64 pixel bytes → aHash: bit i set iff pixel i > floor(mean).
    * Null unless the patch is exactly 64 bytes.
    */
  def ahashBoxed(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length != 64) return null
    var sum = 0
    var i = 0
    while (i < 64) { sum += b(i) & 0xff; i += 1 }
    val mean = sum / 64
    var h = 0L
    i = 0
    while (i < 64) {
      if ((b(i) & 0xff) > mean) h |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  /** Column form: int64 aHash of a 64-byte grayscale patch. */
  def ahash(patch: Column): Column =
    ColumnBridge.column(Ahash64Expr(ColumnBridge.expression(patch)))
}

/** Expression wrapper: int64 aHash from a binary 64-byte patch; null
  * otherwise. Eval and codegen share [[PatchHash.ahashBoxed]].
  */
case class Ahash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType,
      s"ahash needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    PatchHash.ahashBoxed(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long ${ev.value}$$r = graft.multimodal.PatchHash.ahashBoxed($c);
         |${ev.isNull} = ${ev.value}$$r == null;
         |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}$$r.longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Ahash64Expr =
    copy(child = newChild)
}
