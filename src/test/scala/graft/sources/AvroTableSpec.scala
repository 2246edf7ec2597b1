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

  test("nested structs and arrays round-trip exactly (r9)") {
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
    AvroTable.write(df, dir)
    val back = AvroTable.read(spark, dir)
    assert(back.schema == schema ||
      back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType)).toSeq)
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

  test("one container reads as N > 1 sync-marker splits, identically (r9)") {
    // many wide-ish rows in ONE container so several block syncs exist
    val df = (1L to 20000L).toDF("id")
      .withColumn("pad", expr("repeat(cast(id as string), 20)"))
      .coalesce(1)
    val dir = tmp()
    AvroTable.write(df, dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".avro")) == 1)
    val whole = AvroTable.read(spark, dir)
    val split = AvroTable.read(spark, dir, splitBytes = 64 * 1024)
    assert(split.rdd.getNumPartitions > 1,
      "expected the single container to fan out over multiple splits")
    assert(split.count() == 20000L)
    assert(split.agg(sum("id")).head().getLong(0) ==
      whole.agg(sum("id")).head().getLong(0))
    assert(split.select("id").as[Long].collect().sorted.toSeq ==
      (1L to 20000L))
  }

  test("decimal/date/timestamp/map logical types round-trip exactly (r10)") {
    val df = spark.range(1, 50).toDF("id").select(
      col("id"),
      expr("CAST(CAST(id * 101 + 25 AS DECIMAL(16,2)) / 100 AS DECIMAL(12,2))")
        .as("dec"),
      expr("date_add(DATE '2021-03-01', CAST(id AS INT))").as("dt"),
      expr("timestamp_micros(1600000000000000 + id * 1000001)").as("ts"),
      map(concat(lit("k"), col("id")), col("id") * 2).as("mp"))
    val dir = tmp()
    AvroTable.write(df.repartition(2), dir)
    val back = AvroTable.read(spark, dir)
    assert(back.schema("dec").dataType == DecimalType(12, 2))
    assert(back.schema("dt").dataType == DateType)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("mp").dataType ==
      MapType(StringType, LongType, valueContainsNull = false))
    val diff = back.select(
      (col("dec") * 100).cast("long") - (col("id") * 101 + 25),
      datediff(col("dt"), lit("2021-03-01")) - col("id"),
      expr("unix_micros(ts)") - (lit(1600000000000000L) + col("id") * 1000001),
      element_at(col("mp"), concat(lit("k"), col("id"))) - col("id") * 2)
    assert(back.count() == 49)
    assert(diff.collect().forall(r => (0 until 4).forall(i => r.getLong(i) == 0L)))
  }

  test("annotation-decode pins: fixed-decimal and timestamp-millis (r10)") {
    // a container written by avro-core itself with the two carrier
    // forms the house WRITER never emits: decimal on FIXED, and
    // timestamp-millis — the reader must decode both by annotation
    val json =
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},
        |{"name":"dfx","type":{"type":"fixed","name":"d5","size":5,
        |  "logicalType":"decimal","precision":9,"scale":3}},
        |{"name":"tsm","type":{"type":"long",
        |  "logicalType":"timestamp-millis"}}]}""".stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(json)
    val dir = tmp()
    val f = new java.io.File(dir, "part-00000.avro")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, f)
    val fixedSchema = schema.getField("dfx").schema()
    (1L to 3L).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("id", i)
      // unscaled value i*1000+1, scale 3 => i.001, left-padded to 5 bytes
      val unscaled = java.math.BigInteger.valueOf(i * 1000 + 1).toByteArray
      val padded = new Array[Byte](5)
      System.arraycopy(unscaled, 0, padded, 5 - unscaled.length, unscaled.length)
      rec.put("dfx", new org.apache.avro.generic.GenericData.Fixed(
        fixedSchema, padded))
      rec.put("tsm", 1600000000000L + i) // millis
      w.append(rec)
    }
    w.close()
    val back = AvroTable.read(spark, dir).orderBy("id").collect()
    assert(back(0).getDecimal(1) == new java.math.BigDecimal("1.001"))
    assert(back(2).getDecimal(1) == new java.math.BigDecimal("3.001"))
    // millis scale up to micros: 1600000000000 ms + i => *1000 in micros
    val ts1 = back(0).getTimestamp(2)
    assert(ts1.getTime == 1600000000001L)
  }

  test("deflate and snappy containers round-trip; splits survive compression (r10)") {
    for (codec <- Seq("deflate", "snappy")) {
      val dir = tmp()
      val df = (1L to 20000L).toDF("id")
        .withColumn("pad", expr("repeat(cast(id as string), 20)"))
        .coalesce(1)
      AvroTable.write(df, dir, codec = codec)
      // compressed: the container is materially smaller than the raw one
      val rawDir = tmp()
      AvroTable.write(df, rawDir)
      def size(d: String) = new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".avro")).map(_.length()).sum
      assert(size(dir) < size(rawDir) / 2, s"$codec did not compress")
      // whole read and sync-marker split read agree exactly
      val whole = AvroTable.read(spark, dir)
      assert(whole.agg(sum("id")).head().getLong(0) == 200010000L)
      val split = AvroTable.read(spark, dir, splitBytes = 32 * 1024)
      assert(split.rdd.getNumPartitions > 1,
        s"$codec container did not fan out over splits")
      assert(split.select("id").as[Long].collect().sorted.toSeq ==
        (1L to 20000L), s"$codec split read diverged")
    }
  }

  test("enum symbols and plain fixed decode (avro-core-written file, r10)") {
    val json =
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},
        |{"name":"e","type":{"type":"enum","name":"col",
        |  "symbols":["RED","GREEN","BLUE"]}},
        |{"name":"fx","type":{"type":"fixed","name":"f4","size":4}}]}"""
        .stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(json)
    val dir = tmp()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part-00000.avro"))
    val syms = Seq("RED", "GREEN", "BLUE")
    (0L until 6L).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("id", i)
      rec.put("e", new org.apache.avro.generic.GenericData.EnumSymbol(
        schema.getField("e").schema(), syms((i % 3).toInt)))
      rec.put("fx", new org.apache.avro.generic.GenericData.Fixed(
        schema.getField("fx").schema(),
        Array[Byte](i.toByte, (i + 1).toByte, (i + 2).toByte, (i + 3).toByte)))
      w.append(rec)
    }
    w.close()
    val back = AvroTable.read(spark, dir)
    assert(back.schema("e").dataType == StringType)
    assert(back.schema("fx").dataType == BinaryType)
    val got = back.orderBy("id").collect()
    assert(got.map(_.getString(1)).toSeq ==
      (0 until 6).map(i => syms(i % 3)))
    assert(got(2).getAs[Array[Byte]](2).toSeq == Seq[Byte](2, 3, 4, 5))
  }

  test("reader-schema resolution: reorder, defaults, promotion, dropped fields (r10b)") {
    // two writer generations in one directory
    val dir = tmp()
    val g1 = tmp(); val g2 = tmp()
    // gen-1: (id int, v string, legacy string) — narrow id, an extra
    // column the reader no longer carries
    AvroTable.write(Seq((1, "a", "old1"), (2, "b", "old2"))
      .toDF("id", "v", "legacy"), g1)
    // gen-2: reordered (v, extra long, id long)
    AvroTable.write(Seq(("c", 30L, 3L), ("d", 40L, 4L))
      .toDF("v", "extra", "id"), g2)
    Seq(("g1", g1), ("g2", g2)).foreach { case (tag, src) =>
      new java.io.File(src).listFiles().filter(_.getName.endsWith(".avro"))
        .foreach { f =>
          Files.move(f.toPath,
            java.nio.file.Paths.get(dir, s"$tag-${f.getName}"))
        }
    }
    // reader: (id long, v string, extra long) — id PROMOTED, legacy
    // dropped, extra defaulted null on gen-1
    val readerJson = AvroTable.avroSchemaJson(
      StructType.fromDDL("id BIGINT, v STRING, extra BIGINT"), "row")
    val got = AvroTable.readResolved(spark, dir, readerJson)
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.map(_.getString(1)).toSeq == Seq("a", "b", "c", "d"))
    assert(got(0).isNullAt(2) && got(1).isNullAt(2),
      "gen-1 rows must take the reader default for the added column")
    assert(got(2).getLong(2) == 30L && got(3).getLong(2) == 40L)
    // strict read over mixed generations still rejects loudly
    val e = intercept[org.apache.spark.SparkException] {
      AvroTable.read(spark, dir).count()
    }
    assert(e.getMessage.contains("schema mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("schema mismatch")))
    // an incompatible reader (added field with NO default) fails loudly
    val badJson =
      """{"type": "record", "name": "row", "fields": [
        |  {"name": "id", "type": "long"},
        |  {"name": "mandatory_new", "type": "string"}]}""".stripMargin
    intercept[Exception] {
      AvroTable.readResolved(spark, dir, badJson).count()
    }
  }

  test("subset boundaries fail loudly") {
    // non-string-keyed map on write (string-keyed maps are in-subset
    // since r10 — Avro maps are string-keyed by definition)
    val bad = Seq((1L, Map(1 -> 1))).toDF("id", "m")
    val e1 = intercept[IllegalArgumentException] {
      AvroTable.write(bad, tmp())
    }
    assert(e1.getMessage.contains("avro subset"))
    // an out-of-subset logical type rejects loudly on read
    val json =
      """{"type":"record","name":"r","fields":[
        |{"name":"t","type":{"type":"int","logicalType":"time-millis"}}]}"""
        .stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(json)
    val dir0 = tmp()
    val f = new java.io.File(dir0, "part-00000.avro")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, f)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("t", 12); w.append(rec); w.close()
    val e1b = intercept[IllegalArgumentException] {
      AvroTable.read(spark, dir0)
    }
    assert(e1b.getMessage.contains("logical type"))
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
