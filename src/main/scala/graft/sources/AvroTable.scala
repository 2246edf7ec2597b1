package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** F16: generic Avro OBJECT CONTAINER FILE source/sink — the remaining
  * mainstream lake format beside parquet/ORC/CSV/JSON (F2) and the
  * Delta/Iceberg log readers (F14/F15). Spark's own `spark-avro` is an
  * external package; this implements the same core contract on
  * avro-core, which already ships on Spark's classpath (the Iceberg
  * manifest reader uses it — IcebergCatalog.scala:7).
  *
  * Scale shape: READ parallelizes file-at-a-time — the file list is
  * driver metadata, each task streams its file through
  * `DataFileStream` (sequential container-block decode, constant
  * memory, any codec avro-core knows incl. deflate/null); WRITE emits
  * one container file per partition through the Hadoop FileSystem API
  * (works on any Hadoop-compatible FS, not just local disk). Stated
  * subset, rejected loudly: flat records of the primitive types
  * (boolean/int/long/float/double/string/bytes) with 2-branch
  * null unions for nullability — no nested records, arrays, maps,
  * enums, or logical types; splitting WITHIN a container file (Avro
  * sync-marker splits) is not implemented, so parallelism is bounded
  * by file count — the writer's one-file-per-partition layout keeps
  * the two in step.
  */
object AvroTable {

  /** Avro schema (as JSON text) for a Spark schema — flat record of
    * primitives; nullable fields become [null, T] unions.
    */
  def avroSchemaJson(schema: StructType, name: String): String = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case BooleanType => "\"boolean\""
        case IntegerType => "\"int\""
        case LongType => "\"long\""
        case FloatType => "\"float\""
        case DoubleType => "\"double\""
        case StringType => "\"string\""
        case BinaryType => "\"bytes\""
        case other => throw new IllegalArgumentException(
          s"avro subset: unsupported Spark type $other for field ${f.name}")
      }
      val t = if (f.nullable) s"""["null", $base]""" else base
      val dflt = if (f.nullable) """, "default": null""" else ""
      s"""{"name": "${f.name}", "type": $t$dflt}"""
    }
    s"""{"type": "record", "name": "$name",
       | "fields": [${fields.mkString(", ")}]}""".stripMargin
  }

  /** Spark schema for an Avro record schema — the inverse mapping,
    * loud on anything outside the subset.
    */
  def sparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"avro subset: top-level schema must be a record, got ${avro.getType}")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val branches = f.schema().getTypes.asScala
          require(branches.size == 2 &&
            branches.exists(_.getType == Schema.Type.NULL),
            s"avro subset: only [null, T] unions (field ${f.name})")
          val inner = branches.find(_.getType != Schema.Type.NULL).get
          (primitive(inner, f.name), true)
        case _ => (primitive(f.schema(), f.name), false)
      }
      StructField(f.name, t, nullable)
    })
  }

  private def primitive(s: Schema, field: String): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case other => throw new IllegalArgumentException(
      s"avro subset: unsupported Avro type $other (field $field)")
  }

  /** Write `df` as one Avro container file per partition under `dir`
    * (part-NNNNN.avro), via the Hadoop FileSystem of the session.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val schemaJson = avroSchemaJson(df.schema, "row")
    val sparkFields = df.schema.fields
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new Path(dir)
    val fs = out.getFileSystem(conf.value)
    fs.mkdirs(out)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val p = new Path(dir, f"part-$idx%05d.avro")
      val stream = p.getFileSystem(conf.value).create(p, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, stream)
      var n = 0L
      rows.foreach { row =>
        val r = new GenericData.Record(schema)
        var i = 0
        while (i < sparkFields.length) {
          val v = row.get(i)
          r.put(i, if (v == null) null else sparkFields(i).dataType match {
            case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
            case _ => v
          })
          i += 1
        }
        w.append(r)
        n += 1
      }
      w.close()
      Iterator.single(n)
    }.count(): Unit
  }

  /** Read every part-*.avro under `dir` into a DataFrame: schema from
    * the first file (all files must agree — checked per-file at read),
    * one task per file streaming through `DataFileStream`.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    val headSchema = {
      val in = fs.open(new Path(files.head))
      val ds = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try ds.getSchema
      finally { ds.close(); in.close() }
    }
    val schema = sparkSchema(headSchema)
    val schemaJson = headSchema.toString
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { file =>
        val expected = new Schema.Parser().parse(schemaJson)
        val p = new Path(file)
        val in = p.getFileSystem(conf.value).open(p)
        val ds = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        require(ds.getSchema == expected,
          s"avro schema mismatch in $file: ${ds.getSchema} vs $expected")
        val fields = sparkSchema(ds.getSchema).fields
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = ds.hasNext
            if (!h) { ds.close(); in.close() }
            h
          }
          def next(): Row = {
            val rec = ds.next()
            Row.fromSeq(fields.indices.map { i =>
              rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case bb: java.nio.ByteBuffer =>
                  val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
                case v => v
              }
            })
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
