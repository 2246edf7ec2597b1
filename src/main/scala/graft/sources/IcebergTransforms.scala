package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{Decimal, DecimalType}
import org.apache.spark.unsafe.types.UTF8String

/** F15f: Iceberg PARTITION TRANSFORMS (iceberg.apache.org/spec §Partition
  * Transforms + Appendix B) — the functions that turn a source column
  * into a partition value. Real Iceberg tables overwhelmingly partition
  * by `day(ts)`, `bucket(N, id)`, or `truncate(W, s)`, not identity;
  * a reader that rejects them covers a minority of production tables
  * (the r10 verdict's highest-frequency reader gap).
  *
  * Implemented: `identity`, `year`/`month`/`day` (date or timestamp
  * source), `hour` (timestamp), `bucket[N]` (murmur3_x86_32 per
  * Appendix B: ints/longs/dates hash as 8-byte little-endian longs,
  * strings as UTF-8 bytes, seed 0), `truncate[W]` (floor-mod for
  * integers — correct for negatives — and codepoint prefix for
  * strings). `void` and the rest reject loudly.
  *
  * Two evaluation surfaces:
  *  - JVM scalars ([[bucketLong]], [[truncateLong]], …) for partition
  *    PRUNING decisions on the driver (file-count-bounded);
  *  - Spark [[Column]]s ([[column]]) for the WRITE path
  *    ([[IcebergCatalog.commitAppend]]) — the time/truncate transforms
  *    compose from codegen'd builtins; bucket wraps the house murmur3
  *    in a deterministic UDF (write-path only, one evaluation per
  *    appended row; the read path never recomputes buckets).
  */
object IcebergTransforms {

  /** One parsed partition-spec field: `name` is the partition field
    * (manifest/directory) name, `sourceName` the schema column it
    * derives from.
    */
  final case class SpecField(name: String, transform: String, sourceName: String)

  private val BucketRe = "^bucket\\[(\\d+)\\]$".r
  private val TruncRe = "^truncate\\[(\\d+)\\]$".r

  /** Loud validation — an unknown transform must never silently read as
    * identity (it would scan every file AND reconstruct wrong values).
    */
  def validate(transform: String): Unit = transform match {
    case "identity" | "year" | "month" | "day" | "hour" => ()
    case BucketRe(n) => require(n.toInt > 0, s"bucket[$n]: N must be positive")
    case TruncRe(w) => require(w.toInt > 0, s"truncate[$w]: W must be positive")
    case other => throw new IllegalArgumentException(
      s"iceberg partition transform not supported: $other")
  }

  /** Standard murmur3_x86_32 (public-domain Austin Appleby algorithm),
    * the hash Appendix B mandates for `bucket` — implemented locally so
    * the bytes-level contract (little-endian 4-byte blocks, combined
    * 3-byte tail) is pinned here, not inherited from a library with
    * different tail handling.
    */
  def murmur3(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51; val c2 = 0x1b873593
    var h1 = seed
    val n4 = data.length / 4
    var i = 0
    while (i < n4) {
      val i4 = i * 4
      var k1 = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = data.length & 3
    if (tail >= 3) k1 ^= (data(n4 * 4 + 2) & 0xff) << 16
    if (tail >= 2) k1 ^= (data(n4 * 4 + 1) & 0xff) << 8
    if (tail >= 1) {
      k1 ^= data(n4 * 4) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b; h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35; h1 ^= h1 >>> 16
    h1
  }

  /** Appendix B: int, long, and date values hash as the 8-byte
    * LITTLE-ENDIAN long (ints promote, dates hash their epoch-day).
    */
  def hashLong(v: Long): Int = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v)
    murmur3(b.array())
  }

  def hashString(s: String): Int =
    murmur3(s.getBytes(StandardCharsets.UTF_8))

  /** `bucket[n](v)` for integer-family sources (ints/longs/dates as
    * epoch-day, timestamps as epoch-micros — Appendix B's long layout).
    */
  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Integer.MAX_VALUE) % n

  /** `bucket[n](s)` for string sources. */
  def bucketString(s: String, n: Int): Int =
    (hashString(s) & Integer.MAX_VALUE) % n

  // codegen-callable forms over Spark's internal types (r12 — the four
  // write-path ScalaUDFs replaced by native expressions; these statics
  // are what the generated Java calls)

  /** UTF8String is ALREADY the UTF-8 bytes Appendix B hashes. */
  def bucketUtf8(s: UTF8String, n: Int): Int =
    (murmur3(s.getBytes) & Integer.MAX_VALUE) % n

  /** Appendix B fixed/binary: hash the raw bytes. */
  def bucketBytes(b: Array[Byte], n: Int): Int =
    (murmur3(b) & Integer.MAX_VALUE) % n

  /** Appendix B decimal: hash the MINIMAL two's-complement big-endian
    * bytes of the unscaled value (BigInteger.toByteArray is exactly
    * that encoding).
    */
  def bucketDecimal(d: Decimal, n: Int): Int =
    (murmur3(d.toJavaBigDecimal.unscaledValue.toByteArray) &
      Integer.MAX_VALUE) % n

  /** Codepoint-prefix truncate over the internal string type —
    * UTF8String counts code points, so a 4-byte supplementary
    * character never splits.
    */
  def truncateUtf8(s: UTF8String, w: Int): UTF8String =
    if (s.numChars <= w) s else s.substring(0, w)

  /** Spec decimal truncate: v − (v mod W) on the UNSCALED value with a
    * non-negative mod (BigInteger.mod), scale preserved.
    */
  def truncateDecimal(d: Decimal, w: Long): Decimal = {
    val jd = d.toJavaBigDecimal
    val unscaled = jd.unscaledValue
    val trunc = unscaled.subtract(unscaled.mod(java.math.BigInteger.valueOf(w)))
    Decimal(new java.math.BigDecimal(trunc, jd.scale), d.precision, d.scale)
  }

  /** `truncate[w](v)` = v - (v mod w) with a POSITIVE mod — the spec's
    * floor truncation, correct for negative values.
    */
  def truncateLong(v: Long, w: Long): Long = v - java.lang.Math.floorMod(v, w)

  /** `truncate[w](s)` = the first w CODEPOINTS (not chars — a surrogate
    * pair must not split).
    */
  def truncateString(s: String, w: Int): String =
    if (s.codePointCount(0, s.length) <= w) s
    else s.substring(0, s.offsetByCodePoints(0, w))

  /** Can a partition with transform value `raw` hold rows with source
    * values in [lo, hi]? The range-pruning rule per transform (r11):
    * identity is the interval itself; truncate is MONOTONE, so the
    * truncated endpoints bound the reachable partition values; bucket
    * is not monotone — only an equality point (lo == hi) prunes, to
    * exactly one bucket. Time transforms take date/timestamp sources,
    * outside the long-range contract — never pruned here (callers use
    * the partition filter, the F15f gate's shape). Undecodable values
    * always survive: no false negatives.
    */
  def rangeKeeps(transform: String, raw: String, lo: Long, hi: Long): Boolean = {
    def asLong: Option[Long] =
      try Some(raw.trim.toLong) catch { case _: NumberFormatException => None }
    transform match {
      case "identity" => asLong.forall(v => v >= lo && v <= hi)
      case TruncRe(w) =>
        val width = w.toLong
        asLong.forall(v =>
          v >= truncateLong(lo, width) && v <= truncateLong(hi, width))
      case BucketRe(n) =>
        lo != hi || asLong.forall(_ == bucketLong(lo, n.toInt))
      case _ => true
    }
  }

  /** The Spark-side evaluation of one transform over its source column
    * — the WRITE path ([[IcebergCatalog.commitAppend]] derives
    * partition directory values with these). Time transforms expect a
    * date or timestamp source; `epoch` anchors are the spec's (1970).
    */
  def column(transform: String, source: Column): Column = transform match {
    case "identity" => source
    case "year" => (year(source) - 1970).cast("int")
    case "month" =>
      ((year(source) - 1970) * 12 + month(source) - 1).cast("int")
    case "day" => datediff(source, to_date(lit("1970-01-01"))).cast("int")
    case "hour" =>
      floor(unix_micros(source.cast("timestamp")) / 3600000000L).cast("int")
    case BucketRe(_) | TruncRe(_) => throw new IllegalArgumentException(
      s"$transform needs the source type — use columnTyped")
    case other => throw new IllegalArgumentException(
      s"iceberg partition transform not supported: $other")
  }

  /** Type-aware variant used by the writer (the source's Spark type is
    * known from the table schema). bucket/truncate are NATIVE codegen
    * expressions (r12 — Spark's builtin `hash` can't match Appendix B's
    * byte layout, but a ScalaUDF on the partition-derivation path
    * blocked whole-stage codegen fusion; [[IcebergBucketExpr]]/
    * [[IcebergTruncateExpr]] restore it). Supported sources per the
    * spec: bucket over int/long/string/date/timestamp/decimal/binary,
    * truncate over int/long/string/decimal.
    */
  def columnTyped(transform: String, source: Column,
                  dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    transform match {
      case TruncRe(w) => dt match {
        case StringType | IntegerType | LongType | _: DecimalType =>
          ColumnBridge.column(
            IcebergTruncateExpr(ColumnBridge.expression(source), w.toInt))
        case other => throw new IllegalArgumentException(
          s"truncate over $other not supported")
      }
      case BucketRe(n) => dt match {
        case IntegerType | LongType | StringType | DateType |
             TimestampType | BinaryType | _: DecimalType =>
          ColumnBridge.column(
            IcebergBucketExpr(ColumnBridge.expression(source), n.toInt))
        case other => throw new IllegalArgumentException(
          s"bucket over $other not supported")
      }
      case other => column(other, source)
    }
  }
}

/** Appendix-B `bucket[n]` as a native codegen expression: murmur3 over
  * the type's mandated byte layout (ints/longs/dates/timestamps as
  * 8-byte little-endian longs — internal dates ARE epoch-days,
  * timestamps ARE epoch-micros; strings as UTF-8; decimals as minimal
  * big-endian two's-complement unscaled bytes; binary raw), masked
  * non-negative, mod n.
  */
case class IcebergBucketExpr(child: Expression, n: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types._

  require(n > 0, s"bucket[$n]: N must be positive")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes() = {
    require(child.dataType match {
      case IntegerType | LongType | StringType | DateType |
           TimestampType | BinaryType | _: DecimalType => true
      case _ => false
    }, s"bucket over ${child.dataType} not supported")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType | TimestampType =>
      IcebergTransforms.bucketLong(v.asInstanceOf[Long], n)
    case IntegerType | DateType =>
      IcebergTransforms.bucketLong(v.asInstanceOf[Int].toLong, n)
    case StringType =>
      IcebergTransforms.bucketUtf8(v.asInstanceOf[UTF8String], n)
    case BinaryType =>
      IcebergTransforms.bucketBytes(v.asInstanceOf[Array[Byte]], n)
    case _: DecimalType =>
      IcebergTransforms.bucketDecimal(v.asInstanceOf[Decimal], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val call = child.dataType match {
        case LongType | TimestampType =>
          s"graft.sources.IcebergTransforms.bucketLong($c, $n)"
        case IntegerType | DateType =>
          s"graft.sources.IcebergTransforms.bucketLong((long) $c, $n)"
        case StringType =>
          s"graft.sources.IcebergTransforms.bucketUtf8($c, $n)"
        case BinaryType =>
          s"graft.sources.IcebergTransforms.bucketBytes($c, $n)"
        case _: DecimalType =>
          s"graft.sources.IcebergTransforms.bucketDecimal($c, $n)"
      }
      s"${ev.value} = $call;"
    })

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketExpr =
    copy(child = newChild)
}

/** Spec `truncate[w]` as a native codegen expression: floor truncation
  * for integers (correct for negatives), codepoint prefix for strings,
  * unscaled floor-mod for decimals. Result type = source type.
  */
case class IcebergTruncateExpr(child: Expression, w: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types._

  require(w > 0, s"truncate[$w]: W must be positive")

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes() = {
    require(child.dataType match {
      case IntegerType | LongType | StringType | _: DecimalType => true
      case _ => false
    }, s"truncate over ${child.dataType} not supported")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType =>
      IcebergTransforms.truncateLong(v.asInstanceOf[Long], w.toLong)
    case IntegerType =>
      IcebergTransforms.truncateLong(v.asInstanceOf[Int].toLong, w.toLong).toInt
    case StringType =>
      IcebergTransforms.truncateUtf8(v.asInstanceOf[UTF8String], w)
    case _: DecimalType =>
      IcebergTransforms.truncateDecimal(v.asInstanceOf[Decimal], w.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val call = child.dataType match {
        case LongType =>
          s"graft.sources.IcebergTransforms.truncateLong($c, ${w}L)"
        case IntegerType =>
          s"(int) graft.sources.IcebergTransforms.truncateLong((long) $c, ${w}L)"
        case StringType =>
          s"graft.sources.IcebergTransforms.truncateUtf8($c, $w)"
        case _: DecimalType =>
          s"graft.sources.IcebergTransforms.truncateDecimal($c, ${w}L)"
      }
      s"${ev.value} = $call;"
    })

  override protected def withNewChildInternal(newChild: Expression): IcebergTruncateExpr =
    copy(child = newChild)
}
