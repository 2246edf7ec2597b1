package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions with whole-stage codegen (`doGenCode`) for
  * the per-row hot loops that interpreted higher-order lambdas make slow:
  * document fingerprinting and embedding dot products. Both keep an
  * interpreted `nullSafeEval` with identical arithmetic, so eval and
  * codegen paths agree bit-for-bit.
  */
object NativeExpressions {
  /** Polynomial rolling hash over UTF-8 bytes: h = (h*31 + byte) mod p. */
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  /** Dot product of two equal-length float/double array columns, double
    * accumulation in index order (bit-identical to
    * aggregate(zip_with(a,b,(x,y)->x*y),0d,(s,v)->s+v) over double casts).
    */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** |A ∩ B| of two ASCENDING-sorted distinct array<long> columns via a
    * merge scan — O(|A|+|B|) per pair vs the hash-set build of
    * array_intersect; the verification hot loop of similarity joins.
    */
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** First 24 bits of md5 as a long — bit-identical to
    * conv(substring(md5(c), 1, 6), 16, 10) (the hex prefix IS the first
    * three digest bytes) without materializing the 32-char hex string,
    * substring, or base-16 parse. The portable gram/token hash of the
    * dedup family (minhash, simhash).
    */
  def md5_prefix24(c: Column): Column =
    ColumnBridge.column(Md5Prefix24(ColumnBridge.expression(c)))

  /** Pins an expensive expression to the operator where it's written:
    * reports non-deterministic (it is actually pure), so predicate pushdown
    * won't substitute it into a join condition and CollapseProject won't
    * duplicate it into every use site. Use on costly per-row computations
    * (similarity verification, decode) whose filter would otherwise be
    * pushed below the projection that computes them once.
    */
  def fenced(c: Column): Column =
    ColumnBridge.column(OptimizerFence(ColumnBridge.expression(c)))

  /** Content-defined-chunking landmark positions (D24): all 1-based END
    * positions i (8 ≤ i < length) where the 8-char polynomial hash
    * Σ_{k=0..7} codepoint(i−k)·31^k mod 2²⁴ is ≡ 0 mod 64 — one array
    * per document instead of one in-pipeline row per character (the
    * sequence+explode form carried ~8 interpreted-lambda ops per
    * corpus byte; this is a single codegen'd walk, boundaries-only
    * explode downstream). Arithmetic is bit-identical to the SQL form
    * `aggregate(transform(sequence(0,7), k -> ascii(substring(text,
    * i-k, 1)) * 31^k), 0L, (a,x) -> a+x) % 16777216` — codepoint
    * semantics, full sum before the single mod.
    */
  def cdc_landmarks(c: Column): Column =
    ColumnBridge.column(CdcLandmarks(ColumnBridge.expression(c)))

  /** Packed hyperplane sign bits per LSH band: element b of the result is
    * Σ_i [Σ_j emb(j)·planes(b,i,j) ≥ 0]·2^i. A loop in generated code —
    * the equivalent builtin-expression tree unrolls bands×bits×dim terms
    * and breaks the 64KB JVM method limit (whole-stage codegen then falls
    * back to interpreted eval for the entire stage).
    */
  def hyperplane_band_bits(emb: Column, planes: Array[Double],
                           bands: Int, bits: Int, dim: Int): Column =
    ColumnBridge.column(
      HyperplaneBandBits(ColumnBridge.expression(emb), planes, bands, bits, dim))
}

case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    require(child.dataType == StringType, s"rolling_hash needs string, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    RollingHash.hashBytes(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long ${ev.value}_h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value}_h = (${ev.value}_h * 31L + ($bytes[$i] & 0xffL)) % ${RollingHash.Mod}L;
         |}
         |${ev.value} = ${ev.value}_h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Mod: Long = 1000000007L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xffL)) % Mod
      i += 1
    }
    h
  }
}

case class CdcLandmarks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() = {
    require(child.dataType == StringType,
      s"cdc_landmarks needs string, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    CdcLandmarks.landmarks(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // one static-helper call: eval and codegen share the exact loop,
      // so the two paths agree bit-for-bit by construction
      s"${ev.value} = graft.functions.CdcLandmarks$$.MODULE$$.landmarks($c);")

  override protected def withNewChildInternal(newChild: Expression): CdcLandmarks =
    copy(child = newChild)
}

object CdcLandmarks {
  val Mod: Long = 16777216L // 2^24
  val Window: Int = 8
  val Density: Long = 64L // 1-in-64 landmarks
  // 31^k for k = 0..7 (the gate's polynomial, low power at the window end)
  private val Pows: Array[Long] =
    Array.iterate(1L, Window)(_ * 31L)

  /** All 1-based end positions i with 8 ≤ i < n whose trailing 8
    * CODEPOINTS hash to a landmark; n and positions are in codepoints
    * (Spark's substring/ascii/length semantics).
    */
  def landmarks(u: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val cps = u.toString.codePoints().toArray
    val n = cps.length
    val out = new Array[Int](math.max(0, n - Window))
    var m = 0
    var i = Window // 1-based end position
    while (i < n) { // i < len strictly: the final cut is the doc end
      var h = 0L
      var k = 0
      while (k < Window) {
        h += cps(i - 1 - k).toLong * Pows(k)
        k += 1
      }
      if (h % Mod % Density == 0L) { out(m) = i; m += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, m))
  }
}

case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes() = {
    require(Seq(left, right).forall(e => e.dataType.isInstanceOf[ArrayType] &&
      (elemType(e) == FloatType || elemType(e) == DoubleType)),
      s"vec_dot needs array<float|double>, got ${left.dataType} / ${right.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val n = math.min(ad.numElements(), bd.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) ad.getFloat(i).toDouble else ad.getDouble(i)
      val y = if (rf) bd.getFloat(i).toDouble else bd.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getL($i)) * ((double) $b.$getR($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Merge-scan intersection size of two ascending-sorted distinct long
  * arrays. Interpreted eval and codegen share the two-pointer arithmetic.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes() = {
    require(Seq(left, right).forall(e =>
      e.dataType == ArrayType(LongType, containsNull = false) ||
        e.dataType == ArrayType(LongType, containsNull = true)),
      s"sorted_intersect_count needs array<long>, got ${left.dataType} / ${right.dataType}")
    super.checkInputDataTypes()
  }

  // null elements never match anything (and sort wherever the producer put
  // them) — skipped explicitly rather than read via getLong, which would
  // silently unbox them to 0 and "match" a real 0
  override def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0L
    while (i < ad.numElements() && j < bd.numElements()) {
      if (ad.isNullAt(i)) i += 1
      else if (bd.isNullAt(j)) j += 1
      else {
        val x = ad.getLong(i); val y = bd.getLong(j)
        if (x == y) { n += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $x = $a.getLong($i); long $y = $b.getLong($j);
         |    if ($x == $y) { $n++; $i++; $j++; }
         |    else if ($x < $y) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** First three md5 digest bytes of the input string's UTF-8 bytes, as a
  * non-negative long in [0, 2^24).
  */
case class Md5Prefix24(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes() = {
    require(child.dataType == StringType, s"md5_prefix24 needs string, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    Md5Prefix24.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Prefix24.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix24 =
    copy(child = newChild)
}

object Md5Prefix24 {
  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  def hash(u: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(u.getBytes)
    ((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL)
  }
}

/** Identity wrapper marked non-deterministic to stop optimizer rules
  * (predicate pushdown, project collapse) from moving or duplicating the
  * wrapped computation. Pure passthrough in both eval and codegen.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)
}

/** Packed sign bits of hyperplane projections, one int per band.
  * `planes` is the flattened (band, bit, dim) coefficient tensor. The
  * projection accumulates in ascending-dim order in both eval and codegen,
  * matching Σ_j emb[j]·w[b,i,j] as an external engine would compute it.
  */
case class HyperplaneBandBits(child: Expression, planes: Array[Double],
                              bands: Int, bits: Int, dim: Int)
    extends UnaryExpression {
  require(planes.length == bands * bits * dim, "planes tensor shape mismatch")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes() = {
    require(child.dataType.isInstanceOf[ArrayType] && {
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      et == FloatType || et == DoubleType
    }, s"hyperplane_band_bits needs array<float|double>, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(dim, arr.numElements())
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var packed = 0
      var i = 0
      while (i < bits) {
        var acc = 0.0
        var j = 0
        val base = (b * bits + i) * dim
        while (j < n) {
          val x = if (elemFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
          acc += x * planes(base + j)
          j += 1
        }
        if (acc >= 0) packed |= 1 << i
        i += 1
      }
      out(b) = packed
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val get = if (elemFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val b = ctx.freshName("b"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc"); val packed = ctx.freshName("packed")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($dim, $c.numElements());
         |int[] $out = new int[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $packed = 0;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    double $acc = 0.0;
         |    int $base = ($b * $bits + $i) * $dim;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc += ((double) $c.$get($j)) * $planesRef[$base + $j];
         |    }
         |    if ($acc >= 0) $packed |= 1 << $i;
         |  }
         |  $out[$b] = $packed;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandBits =
    copy(child = newChild)
}
