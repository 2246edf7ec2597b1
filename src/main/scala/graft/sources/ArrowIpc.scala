package graft.sources

import java.nio.ByteBuffer
import java.nio.channels.{Channels, SeekableByteChannel}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.{ListVector, StructVector}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** F18: Arrow IPC FILE (Feather v2) source/sink — the zero-copy
  * interchange format feature stores and ML dataloaders speak
  * natively. arrow-vector already ships on Spark's classpath (the
  * pandas-UDF transport uses it); this exposes the FILE format — the
  * random-access variant with a footer — as a table source/sink.
  *
  * Scale shape: READ parallelizes file-at-a-time — the file list is
  * driver metadata, each task walks its file's record batches through
  * `ArrowFileReader` over a seekable Hadoop-FS channel (batch-at-a-time
  * decode, memory bounded by one batch); WRITE emits one IPC file per
  * partition (4096-row batches) through the Hadoop FileSystem API.
  * Stated subset, rejected loudly: schemas of boolean/int/long/float/
  * double/string/binary plus NESTED structs and lists thereof (r9 —
  * any depth); no maps, dictionaries, unions, or extension types.
  * Parallelism is bounded by file count; the writer's
  * one-file-per-partition layout keeps the two in step (the Avro F16
  * contract, same posture).
  */
object ArrowIpc {

  // Arrow's netty-based buffers reflect into java.nio internals; Spark's
  // launcher normally sets this, sbt/plain-java entrypoints may not.
  System.setProperty("io.netty.tryReflectionSetAccessible", "true")

  private def arrowField(name: String, dt: DataType, nullable: Boolean): Field =
    dt match {
      case ArrayType(et, _) =>
        // list items declare nullable regardless of containsNull: Arrow
        // Java's ListVector materializes a nullable element vector, so a
        // non-null item field would not survive the round-trip anyway —
        // widening is stated contract (a nullable read schema accepts
        // every value the narrower write schema produced)
        new Field(name,
          new FieldType(nullable, ArrowType.List.INSTANCE, null),
          Seq(arrowField("item", et, nullable = true)).asJava)
      case st: StructType =>
        new Field(name,
          new FieldType(nullable, ArrowType.Struct.INSTANCE, null),
          st.fields.map(f => arrowField(f.name, f.dataType, f.nullable))
            .toSeq.asJava)
      case _ =>
        val t: ArrowType = dt match {
          case BooleanType => ArrowType.Bool.INSTANCE
          case IntegerType => new ArrowType.Int(32, true)
          case LongType => new ArrowType.Int(64, true)
          case FloatType =>
            new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
          case DoubleType =>
            new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
          case StringType => ArrowType.Utf8.INSTANCE
          case BinaryType => ArrowType.Binary.INSTANCE
          case other => throw new IllegalArgumentException(
            s"arrow subset: unsupported Spark type $other for field $name")
        }
        new Field(name, new FieldType(nullable, t, null), null)
    }

  /** Arrow schema for a Spark schema — primitives, structs, and lists;
    * loud otherwise.
    */
  def arrowSchema(schema: StructType): ArrowSchema =
    new ArrowSchema(schema.fields
      .map(f => arrowField(f.name, f.dataType, f.nullable)).toSeq.asJava)

  private def sparkType(f: Field): (DataType, Boolean) = {
    val t = f.getType match {
      case _: ArrowType.Bool => BooleanType
      case i: ArrowType.Int if i.getBitWidth == 32 && i.getIsSigned =>
        IntegerType
      case i: ArrowType.Int if i.getBitWidth == 64 && i.getIsSigned =>
        LongType
      case fp: ArrowType.FloatingPoint
          if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case fp: ArrowType.FloatingPoint
          if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Binary => BinaryType
      case _: ArrowType.List =>
        val (et, en) = sparkType(f.getChildren.get(0))
        ArrayType(et, containsNull = en)
      case _: ArrowType.Struct =>
        StructType(f.getChildren.asScala.toSeq.map { c =>
          val (ct, cn) = sparkType(c)
          StructField(c.getName, ct, cn)
        })
      case other => throw new IllegalArgumentException(
        s"arrow subset: unsupported Arrow type $other (field ${f.getName})")
    }
    (t, f.isNullable)
  }

  /** Spark schema for an Arrow schema — the inverse mapping, loud on
    * anything outside the subset.
    */
  def sparkSchema(schema: ArrowSchema): StructType =
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (t, n) = sparkType(f)
      StructField(f.getName, t, n)
    })

  /** Read-only seekable NIO channel over a Hadoop FS stream — what
    * `ArrowFileReader` needs to reach the IPC footer then each batch.
    */
  private final class FsChannel(in: FSDataInputStream, len: Long)
      extends SeekableByteChannel {
    private var open = true
    override def read(dst: ByteBuffer): Int = {
      val buf = new Array[Byte](dst.remaining())
      val n = in.read(buf, 0, buf.length)
      if (n > 0) dst.put(buf, 0, n)
      n
    }
    override def write(src: ByteBuffer): Int =
      throw new UnsupportedOperationException("read-only channel")
    override def position(): Long = in.getPos
    override def position(p: Long): SeekableByteChannel = {
      in.seek(p); this
    }
    override def size(): Long = len
    override def truncate(size: Long): SeekableByteChannel =
      throw new UnsupportedOperationException("read-only channel")
    override def isOpen: Boolean = open
    override def close(): Unit = { open = false; in.close() }
  }

  private val BatchRows = 4096

  /** Recursive cell write: `dt` drives the interpretation, the vector's
    * own shape drives growth (`setSafe`/`startNewValue`).
    */
  private def setCell(v: FieldVector, i: Int, dt: DataType, value: Any): Unit =
    if (value == null) v match {
      case fv: BaseFixedWidthVector => fv.setNull(i)
      case vv: BaseVariableWidthVector => vv.setNull(i)
      case lv: ListVector => lv.setNull(i)
      case sv: StructVector => sv.setNull(i)
      case other => throw new IllegalStateException(
        s"arrow subset: unexpected vector ${other.getClass}")
    }
    else (v, dt) match {
      case (b: BitVector, _) =>
        b.setSafe(i, if (value.asInstanceOf[Boolean]) 1 else 0)
      case (iv: IntVector, _) => iv.setSafe(i, value.asInstanceOf[Int])
      case (lv: BigIntVector, _) => lv.setSafe(i, value.asInstanceOf[Long])
      case (f4: Float4Vector, _) => f4.setSafe(i, value.asInstanceOf[Float])
      case (f8: Float8Vector, _) => f8.setSafe(i, value.asInstanceOf[Double])
      case (s: VarCharVector, _) =>
        s.setSafe(i, value.asInstanceOf[String].getBytes("UTF-8"))
      case (bin: VarBinaryVector, _) =>
        bin.setSafe(i, value.asInstanceOf[Array[Byte]])
      case (lv: ListVector, ArrayType(et, _)) =>
        val seq = value.asInstanceOf[scala.collection.Seq[Any]]
        val start = lv.startNewValue(i)
        val dataV = lv.getDataVector.asInstanceOf[FieldVector]
        var off = start
        seq.foreach { e => setCell(dataV, off, et, e); off += 1 }
        lv.endValue(i, seq.length)
      case (sv: StructVector, st: StructType) =>
        sv.setIndexDefined(i)
        val row = value.asInstanceOf[Row]
        var c = 0
        while (c < st.length) {
          setCell(sv.getChildrenFromFields.get(c), i,
            st.fields(c).dataType, row.get(c))
          c += 1
        }
      case (other, _) => throw new IllegalStateException(
        s"arrow subset: unexpected vector ${other.getClass} for $dt")
    }

  /** Recursive cell read: Arrow runtime objects → Spark row values. */
  private def fromArrow(v: Any, dt: DataType): Any = v match {
    case null => null
    case t: org.apache.arrow.vector.util.Text => t.toString
    case l: java.util.List[_] =>
      val et = dt.asInstanceOf[ArrayType].elementType
      l.asScala.map(e => fromArrow(e, et)).toSeq
    case m: java.util.Map[_, _] =>
      val st = dt.asInstanceOf[StructType]
      val mm = m.asInstanceOf[java.util.Map[String, AnyRef]]
      Row.fromSeq(st.fields.toSeq.map(f => fromArrow(mm.get(f.name), f.dataType)))
    case other => other
  }

  /** Write `df` as one Arrow IPC file per partition under `dir`
    * (part-NNNNN.arrow), batches of [[BatchRows]].
    */
  def write(df: DataFrame, dir: String): Unit = {
    val schemaDdl = df.schema.toDDL
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new Path(dir)
    out.getFileSystem(conf.value).mkdirs(out)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      System.setProperty("io.netty.tryReflectionSetAccessible", "true")
      val sparkFields = StructType.fromDDL(schemaDdl)
      val p = new Path(dir, f"part-$idx%05d.arrow")
      val stream = p.getFileSystem(conf.value).create(p, true)
      val allocator = new RootAllocator()
      val root = VectorSchemaRoot.create(arrowSchema(sparkFields), allocator)
      val writer = new ArrowFileWriter(root, null, Channels.newChannel(stream))
      writer.start()
      var total = 0L
      val batch = rows.grouped(BatchRows)
      while (batch.hasNext) {
        val chunk = batch.next()
        root.allocateNew()
        var i = 0
        chunk.foreach { row =>
          var c = 0
          while (c < sparkFields.length) {
            setCell(root.getVector(c).asInstanceOf[FieldVector], i,
              sparkFields(c).dataType, if (row.isNullAt(c)) null else row.get(c))
            c += 1
          }
          i += 1
        }
        root.setRowCount(i)
        writer.writeBatch()
        total += i
      }
      writer.end(); writer.close(); root.close(); allocator.close()
      Iterator.single(total)
    }.count(): Unit
  }

  /** Read every part-*.arrow under `dir`: schema from the first file's
    * footer (all files must agree — checked per-file at read), one task
    * per file, batch-at-a-time.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".arrow"))
      .map(s => (s.getPath.toString, s.getLen)).sorted
    require(files.nonEmpty, s"no .arrow files under $dir")
    val schema = {
      val (f, len) = files.head
      val in = fs.open(new Path(f))
      val alloc = new RootAllocator()
      val r = new ArrowFileReader(new FsChannel(in, len), alloc)
      try sparkSchema(r.getVectorSchemaRoot.getSchema)
      finally { r.close(); alloc.close() }
    }
    val schemaDdl = schema.toDDL
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { case (file, len) =>
        System.setProperty("io.netty.tryReflectionSetAccessible", "true")
        val expected = StructType.fromDDL(schemaDdl)
        val p = new Path(file)
        val in = p.getFileSystem(conf.value).open(p)
        val alloc = new RootAllocator()
        val reader = new ArrowFileReader(new FsChannel(in, len), alloc)
        val vroot = reader.getVectorSchemaRoot
        require(sparkSchema(vroot.getSchema) == expected,
          s"arrow schema mismatch in $file: ${vroot.getSchema}")
        val nCols = expected.length
        // close on task completion, not only on iterator exhaustion: an
        // early-terminated scan (limit) would otherwise leak the HDFS
        // stream and allocator memory for the executor's lifetime
        var closed = false
        def closeAll(): Unit =
          if (!closed) { closed = true; reader.close(); alloc.close() }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeAll())
        new Iterator[Row] {
          private var i = 0
          private var n = 0
          private var done = false
          private def advance(): Unit =
            while (!done && i >= n) {
              if (reader.loadNextBatch()) { n = vroot.getRowCount; i = 0 }
              else {
                done = true
                closeAll()
              }
            }
          def hasNext: Boolean = { advance(); !done }
          def next(): Row = {
            advance()
            val vals = new Array[Any](nCols)
            var c = 0
            while (c < nCols) {
              vals(c) = fromArrow(vroot.getVector(c).getObject(i),
                expected.fields(c).dataType)
              c += 1
            }
            i += 1
            Row.fromSeq(vals.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
