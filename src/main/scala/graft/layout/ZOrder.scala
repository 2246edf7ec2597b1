package graft.layout

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) multi-column clustering for data skipping.
  *
  * A table sorted on x answers x-ranges with few files but reads
  * EVERYTHING for a y-only predicate. Interleaving the bits of (x, y)
  * into one z-value and range-partitioning on it gives every file a
  * bounded rectangle of (x, y) space, so per-file min/max statistics
  * prune on BOTH dimensions — the layout trick behind Delta/Iceberg
  * OPTIMIZE ZORDER, here as a plain Spark write pattern plus a
  * manifest-based pruned scan (at 100 TB the manifest is the table
  * format's stats file; locally we derive it once from the footers).
  *
  * z-values are computed by a native codegen expression: 2·bits
  * shift/mask terms as a builtin tree would either unroll huge or go
  * interpreted; a generated loop stays inside whole-stage codegen.
  */
object ZOrder {
  /** Morton-interleave the low `bits` bits of two non-negative longs:
    * result bit 2i = bit i of x, bit 2i+1 = bit i of y.
    */
  def zvalue(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(
      ZValue(ColumnBridge.expression(x), ColumnBridge.expression(y), bits))

  /** N-dimensional Morton interleave: result bit (i·n + c) = bit i of
    * column c. Requires n·bits ≤ 63. Three or four clustered dimensions
    * is the practical lakehouse sweet spot — beyond that each dimension's
    * selectivity contribution shrinks as 2^(bits/n).
    */
  def zvalueN(cols: Seq[Column], bits: Int): Column =
    ColumnBridge.column(ZValueN(cols.map(ColumnBridge.expression), bits))

  /** Reference implementation (specs + driver-side checks). */
  def zvalueRef(x: Long, y: Long, bits: Int): Long = zvalueNRef(Seq(x, y), bits)

  def zvalueNRef(xs: Seq[Long], bits: Int): Long = {
    val n = xs.length
    var z = 0L
    var i = 0
    while (i < bits) {
      var c = 0
      while (c < n) {
        z |= ((xs(c) >> i) & 1L) << (i * n + c)
        c += 1
      }
      i += 1
    }
    z
  }

  /** Write `df` z-clustered into ~`nFiles` files: range-partition on the
    * z-value so each file owns a contiguous z-interval (a bounded
    * rectangle stack in (x,y) space), sort within partitions so row
    * groups inside a file are tight too.
    */
  def writeClustered(df: DataFrame, path: String, z: Column, nFiles: Int): Unit =
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** F11: incremental layout maintenance — append a DELTA to an existing
    * clustered table as fresh z-sorted files, leaving every base file
    * untouched. The delta files are each internally clustered but their
    * z-ranges OVERLAP the base files' (that's the deal: append cost is
    * O(delta), and pruning degrades gracefully — a probe now selects base
    * files by box plus whichever delta files overlap — until a compaction
    * re-sorts). Returns the new files' paths so the manifest can be
    * extended by scanning ONLY the delta (see
    * [[FileManifest.appendVersion]]); at 100 TB re-scanning the table per
    * append is exactly what this path exists to avoid.
    */
  def appendClustered(df: DataFrame, path: String, z: Column,
                      nFiles: Int): Seq[String] = {
    // resolve through the Hadoop FileSystem of the path's scheme — a
    // java.io listing silently returns nothing for hdfs://, s3a://, or
    // even file: URIs, and a manifest committed without the appended
    // files would make manifest-pruned reads silently drop rows
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(conf)
    def files(): Set[String] =
      if (!fs.exists(hPath)) Set.empty
      else fs.listStatus(hPath)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString).toSet // full URI — scheme survives
    val before = files()
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("append").parquet(path)
    val added = (files() -- before).toSeq.sorted
    require(added.nonEmpty || df.isEmpty,
      s"appendClustered: post-write listing of $path gained no files — " +
        "refusing to report an append the manifest would then miss " +
        "(concurrent writer or listing/scheme mismatch?)")
    added
  }

  /** Per-file min/max statistics for `cols` — one scan, grouped by file.
    * At lakehouse scale this is free (the table format already stores it);
    * deriving it here keeps the pruning path honest end-to-end.
    */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The k bloom bit positions of a value: pmod(xxhash64(v, seed_i), bits)
    * — pure builtin hashing, so index build and probe are bit-identical
    * by construction.
    */
  def bloomPositions(v: Column, bits: Int, hashes: Int): Column =
    array((0 until hashes).map(i =>
      pmod(xxhash64(v, lit(i)), lit(bits)).cast("int")): _*)

  /** Per-file SECONDARY bloom index over a non-clustered column. Min/max
    * boxes prune range predicates on the CLUSTERED dimensions; an equality
    * probe on any other column hits every file's [min,max] and prunes
    * nothing. A per-file bloom (sparse form: the sorted set of set bit
    * positions, ≤ `bits` ints per file) answers "might this file contain
    * v?" instead. One scan, one groupBy(file) — at lakehouse scale this
    * column lives in the manifest next to the min/max stats.
    */
  def fileBloomIndex(spark: SparkSession, path: String, column: String,
                     bits: Int = 4096, hashes: Int = 3): DataFrame =
    spark.read.parquet(path)
      .select(input_file_name().as("file"),
        explode(bloomPositions(col(column), bits, hashes)).as("pos"))
      .groupBy(col("file"))
      .agg(sort_array(collect_set(col("pos"))).as("bloom_bits"))

  /** Equality-probe scan through the bloom index: read only files whose
    * bloom MIGHT contain the value (no false negatives — every true hit
    * is read), residual-filter exactly. Returns (selected, total, df).
    */
  def bloomPrunedScan(spark: SparkSession, path: String, index: DataFrame,
                      column: String, value: Any,
                      bits: Int = 4096, hashes: Int = 3): (Long, Long, DataFrame) = {
    // xxhash64 is input-TYPE-sensitive (hashLong vs hashInt give different
    // bits): cast the probe to the indexed column's actual type or an
    // Int-vs-Long mismatch silently false-negatives every file
    val colType = spark.read.parquet(path).schema(column).dataType
    val probe = bloomPositions(lit(value).cast(colType), bits, hashes)
    val total = index.count()
    val files = index
      .filter(forall(probe, p => array_contains(col("bloom_bits"), p)))
      .select("file").collect().map(_.getString(0))
    val df =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*).filter(col(column) === lit(value))
    (files.length.toLong, total, df)
  }

  /** Scan only the files whose [min,max] box intersects the predicate
    * box, then apply the exact predicate as a residual. Returns
    * (selectedFiles, totalFiles, dataframe).
    */
  def prunedScan(spark: SparkSession, path: String, stats: DataFrame,
                 ranges: Map[String, (Long, Long)]): (Long, Long, DataFrame) = {
    val intersects = ranges.map { case (c, (lo, hi)) =>
      col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }.reduce(_ && _)
    val total = stats.count()
    val files = stats.filter(intersects).select("file")
      .collect().map(_.getString(0))
    val residual = ranges.map { case (c, (lo, hi)) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    val df =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*).filter(residual)
    (files.length.toLong, total, df)
  }
}

/** Morton interleave of the low `bits` bits of two longs. Negative inputs
  * are rejected at eval time (a z-curve over sign bits orders nothing).
  */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits in [1,31]")
  override def dataType: DataType = LongType

  override def checkInputDataTypes() = {
    require(left.dataType == LongType && right.dataType == LongType,
      s"zvalue needs (bigint, bigint), got ${left.dataType} / ${right.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]; val y = b.asInstanceOf[Long]
    if (x < 0 || y < 0)
      throw new IllegalArgumentException(s"zvalue: negative input ($x, $y)")
    ZOrder.zvalueRef(x, y, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |if ($a < 0L || $b < 0L) {
         |  throw new IllegalArgumentException("zvalue: negative input");
         |}
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

/** N-ary Morton interleave (see [[ZOrder.zvalueN]]). A generated loop per
  * dimension keeps any arity inside whole-stage codegen.
  */
case class ZValueN(children: Seq[Expression], bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.Expression {
  require(children.nonEmpty && bits >= 1 && children.length * bits <= 63,
    s"need n*bits <= 63, got n=${children.length} bits=$bits")
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes() = {
    require(children.forall(_.dataType == LongType),
      s"zvalue_n needs bigint inputs, got ${children.map(_.dataType)}")
    super.checkInputDataTypes()
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Long](children.length)
    var c = 0
    while (c < children.length) {
      val v = children(c).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long]
      if (x < 0) throw new IllegalArgumentException(s"zvalue_n: negative input $x")
      vals(c) = x
      c += 1
    }
    ZOrder.zvalueNRef(vals.toSeq, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.length
    val evs = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val i = ctx.freshName("i")
    val interleave = evs.zipWithIndex.map { case (e, c) =>
      s"$z |= ((${e.value} >> $i) & 1L) << ($i * $n + $c);"
    }.mkString("\n")
    val guards = evs.map(e =>
      s"""if (${e.value} < 0L) { throw new IllegalArgumentException("zvalue_n: negative input"); }"""
    ).mkString("\n")
    val nullChecks =
      if (nullable) evs.map(_.isNull.toString).mkString(" || ") else "false"
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childCode = evs.map(_.code).reduce(_ + _)
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $nullChecks;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          $guards
          long $z = 0L;
          for (int $i = 0; $i < $bits; $i++) {
            $interleave
          }
          ${ev.value} = $z;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValueN = copy(children = newChildren)
}
