package graft.sources

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** F18: the Arrow IPC file source/sink — full-primitive round-trip
  * with nulls, multi-batch files, per-partition layout, and the loud
  * subset/mismatch boundaries.
  */
class ArrowIpcSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("arrow_spec").toString

  test("every primitive type plus nulls round-trips exactly") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("b", BooleanType, nullable = true),
      StructField("i", IntegerType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("raw", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, true, 42, 1.5f, 2.25, "alpha é中", Array[Byte](1, 2, 3)),
      Row(2L, false, -7, -0.5f, 1e9, "", Array.empty[Byte]),
      Row(3L, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmp()
    ArrowIpc.write(df, dir)
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy("id").collect()
    assert(got.length == 3)
    assert(got(0).getLong(0) == 1L && got(0).getBoolean(1) &&
      got(0).getInt(2) == 42 && got(0).getFloat(3) == 1.5f &&
      got(0).getDouble(4) == 2.25 && got(0).getString(5) == "alpha é中")
    assert(got(0).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    assert(got(2).isNullAt(1) && got(2).isNullAt(2) && got(2).isNullAt(3) &&
      got(2).isNullAt(4) && got(2).isNullAt(5) && got(2).isNullAt(6))
  }

  test("files span multiple record batches past the 4096-row boundary") {
    val df = (1L to 10000L).toDF("id").repartition(1)
    val dir = tmp()
    ArrowIpc.write(df, dir)
    val back = ArrowIpc.read(spark, dir)
    assert(back.count() == 10000L)
    assert(back.agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) == 10000L * 10001L / 2)
  }

  test("one IPC file per partition; read parallelizes per file") {
    val df = (1L to 100L).toDF("id").repartition(5)
    val dir = tmp()
    ArrowIpc.write(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrow"))
    assert(files.length == 5)
    val back = ArrowIpc.read(spark, dir)
    assert(back.rdd.getNumPartitions == 5)
    assert(back.count() == 100)
  }

  test("files carry the Arrow IPC file magic") {
    val df = Seq(1L).toDF("id")
    val dir = tmp()
    ArrowIpc.write(df, dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrow")).head
    val bytes = Files.readAllBytes(f.toPath)
    assert(new String(bytes.take(6), "US-ASCII") == "ARROW1")
    assert(new String(bytes.takeRight(6), "US-ASCII") == "ARROW1")
  }

  test("unsupported Spark type is loud at write") {
    // maps stay out of subset (lists/structs are in since r9)
    val df = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    intercept[Exception] {
      ArrowIpc.write(df, tmp())
    }
  }

  test("nested structs and lists round-trip exactly (r9)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("nm", StringType, nullable = true),
        StructField("ln", LongType, nullable = true))), nullable = true),
      StructField("arr", ArrayType(LongType, containsNull = true),
        nullable = true),
      StructField("recs", ArrayType(StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("v", StringType, nullable = true))),
        containsNull = false), nullable = true)))
    val rows = Seq(
      Row(1L, Row("alpha", 5L), Seq(1L, 2L, 3L), Seq(Row(1L, "x"), Row(2L, null))),
      Row(2L, Row(null, null), Seq(4L, null), Seq.empty[Row]),
      Row(3L, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmp()
    ArrowIpc.write(df, dir)
    val back = ArrowIpc.read(spark, dir)
    // list items widen to nullable on round-trip (stated contract)
    def widen(dt: DataType): DataType = dt match {
      case ArrayType(et, _) => ArrayType(widen(et), containsNull = true)
      case StructType(fs) => StructType(fs.map(f => f.copy(dataType = widen(f.dataType))))
      case other => other
    }
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, widen(f.dataType))).toSeq)
    val got = back.orderBy("id").collect()
    assert(got(0).getStruct(1).getString(0) == "alpha")
    assert(got(0).getStruct(1).getLong(1) == 5L)
    assert(got(0).getSeq[Long](2) == Seq(1L, 2L, 3L))
    assert(got(0).getSeq[Row](3) == Seq(Row(1L, "x"), Row(2L, null)))
    assert(got(1).getStruct(1).isNullAt(0))
    assert(got(1).getSeq[Any](2) == Seq(4L, null))
    assert(got(1).getSeq[Row](3).isEmpty)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2) && got(2).isNullAt(3))
  }

  test("schema mismatch across files is loud at read") {
    val dir = tmp()
    ArrowIpc.write(Seq(1L).toDF("id").repartition(1), dir)
    val other = tmp()
    ArrowIpc.write(Seq("x").toDF("name").repartition(1), other)
    val moved = new java.io.File(other).listFiles()
      .filter(_.getName.endsWith(".arrow")).head
    Files.move(moved.toPath,
      new java.io.File(dir, "part-99999.arrow").toPath)
    intercept[org.apache.spark.SparkException] {
      ArrowIpc.read(spark, dir).count()
    }
  }

  test("empty directory is loud") {
    intercept[IllegalArgumentException] {
      ArrowIpc.read(spark, tmp())
    }
  }
}
