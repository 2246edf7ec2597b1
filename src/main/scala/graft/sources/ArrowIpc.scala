package graft.sources

import java.nio.ByteBuffer
import java.nio.channels.{Channels, SeekableByteChannel}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
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
  * Stated subset, rejected loudly: flat schemas of
  * boolean/int/long/float/double/string/binary — no nested types,
  * dictionaries, or extension types. Parallelism is bounded by file
  * count; the writer's one-file-per-partition layout keeps the two in
  * step (the Avro F16 contract, same posture).
  */
object ArrowIpc {

  // Arrow's netty-based buffers reflect into java.nio internals; Spark's
  // launcher normally sets this, sbt/plain-java entrypoints may not.
  System.setProperty("io.netty.tryReflectionSetAccessible", "true")

  /** Arrow schema for a Spark schema — flat primitives only, loud
    * otherwise.
    */
  def arrowSchema(schema: StructType): ArrowSchema = {
    val fields = schema.fields.map { f =>
      val t: ArrowType = f.dataType match {
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
          s"arrow subset: unsupported Spark type $other for field ${f.name}")
      }
      new Field(f.name, new FieldType(f.nullable, t, null), null)
    }
    new ArrowSchema(fields.toSeq.asJava)
  }

  /** Spark schema for an Arrow schema — the inverse mapping, loud on
    * anything outside the subset.
    */
  def sparkSchema(schema: ArrowSchema): StructType =
    StructType(schema.getFields.asScala.toSeq.map { f =>
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
        case other => throw new IllegalArgumentException(
          s"arrow subset: unsupported Arrow type $other (field ${f.getName})")
      }
      StructField(f.getName, t, f.isNullable)
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
            val v = root.getVector(c)
            if (row.isNullAt(c)) v.asInstanceOf[FieldVector] match {
              case fv: BaseFixedWidthVector => fv.setNull(i)
              case vv: BaseVariableWidthVector => vv.setNull(i)
              case other => throw new IllegalStateException(
                s"arrow subset: unexpected vector ${other.getClass}")
            }
            else v match {
              case b: BitVector =>
                b.setSafe(i, if (row.getBoolean(c)) 1 else 0)
              case iv: IntVector => iv.setSafe(i, row.getInt(c))
              case lv: BigIntVector => lv.setSafe(i, row.getLong(c))
              case f4: Float4Vector => f4.setSafe(i, row.getFloat(c))
              case f8: Float8Vector => f8.setSafe(i, row.getDouble(c))
              case s: VarCharVector =>
                s.setSafe(i, row.getString(c).getBytes("UTF-8"))
              case bin: VarBinaryVector =>
                bin.setSafe(i, row.getAs[Array[Byte]](c))
              case other => throw new IllegalStateException(
                s"arrow subset: unexpected vector ${other.getClass}")
            }
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
              vals(c) = vroot.getVector(c).getObject(i) match {
                case null => null
                case t: org.apache.arrow.vector.util.Text => t.toString
                case v => v
              }
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
