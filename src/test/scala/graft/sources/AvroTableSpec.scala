package graft.sources

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** F16: the Avro container source/sink — full-primitive round-trip with
  * nulls, multi-partition file layout, cross-compat with avro-core's
  * own reader, and the loud subset boundaries.
  */
class AvroTableSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("avro_spec").toString

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
      Row(1L, true, 42, 1.5f, 2.25, "alpha", Array[Byte](1, 2, 3)),
      Row(2L, false, -7, -0.5f, 1e9, "", Array.empty[Byte]),
      Row(3L, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmp()
    AvroTable.write(df, dir)
    val back = AvroTable.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy("id").collect()
    assert(got.length == 3)
    assert(got(0).getLong(0) == 1L && got(0).getBoolean(1) &&
      got(0).getInt(2) == 42 && got(0).getFloat(3) == 1.5f &&
      got(0).getDouble(4) == 2.25 && got(0).getString(5) == "alpha")
    assert(got(0).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    assert(got(2).isNullAt(1) && got(2).isNullAt(2) && got(2).isNullAt(3) &&
      got(2).isNullAt(4) && got(2).isNullAt(5) && got(2).isNullAt(6))
  }

  test("one container file per partition; read parallelizes per file") {
    val df = (1L to 100L).toDF("id").repartition(5)
    val dir = tmp()
    AvroTable.write(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 5)
    val back = AvroTable.read(spark, dir)
    assert(back.rdd.getNumPartitions == 5)
    assert(back.agg(sum("id")).head().getLong(0) == 5050L)
    assert(back.count() == 100)
  }

  test("files written here are plain Avro: avro-core reads them directly") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s").coalesce(1)
    val dir = tmp()
    AvroTable.write(df, dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val ds = new org.apache.avro.file.DataFileStream[
        org.apache.avro.generic.GenericRecord](
      new java.io.FileInputStream(f),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val recs = Iterator.continually(ds).takeWhile(_.hasNext)
      .map(_.next()).toList
    ds.close()
    assert(recs.map(r => (r.get("id"),
      r.get("s").toString)).toSet == Set((1L, "x"), (2L, "y")))
  }

  test("subset boundaries fail loudly") {
    // nested/array Spark type on write
    val bad = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val e1 = intercept[IllegalArgumentException] {
      AvroTable.write(bad, tmp())
    }
    assert(e1.getMessage.contains("avro subset"))
    // schema disagreement across files
    val dir = tmp()
    AvroTable.write(Seq(Tuple1(1L)).toDF("id").coalesce(1), dir)
    val other = tmp()
    AvroTable.write(Seq(Tuple1("s")).toDF("id").coalesce(1), other)
    val f2 = new java.io.File(other).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    Files.copy(f2.toPath,
      new java.io.File(dir, "part-zz.avro").toPath)
    val e2 = intercept[org.apache.spark.SparkException] {
      AvroTable.read(spark, dir).count()
    }
    assert(e2.getMessage.contains("schema mismatch") ||
      e2.getCause.getMessage.contains("schema mismatch"))
    // empty dir
    val e3 = intercept[IllegalArgumentException] {
      AvroTable.read(spark, tmp())
    }
    assert(e3.getMessage.contains("no .avro files"))
  }
}
