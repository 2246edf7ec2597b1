package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** F17: the zstd JSONL source/sink — escaping-heavy round-trip, shard
  * layout, and the loud failure boundaries (corrupt frame, malformed
  * line under FAILFAST, empty dir).
  */
class ZstdJsonlSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("zstd_spec").toString

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("n", LongType, nullable = true)))

  test("JSON-escaping-heavy strings and nulls round-trip exactly") {
    val rows = Seq(
      Row(1L, "plain", 10L),
      Row(2L, "quotes \" and \\ backslash", 20L),
      Row(3L, "newline\nand\ttab", 30L),
      Row(4L, "unicode é中文", 40L),
      Row(5L, null, null),
      Row(6L, "", 0L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp()
    ZstdJsonl.write(df, dir)
    val back = ZstdJsonl.read(spark, dir, schema).orderBy("id").collect()
    assert(back.length == 6)
    assert(back(1).getString(1) == "quotes \" and \\ backslash")
    assert(back(2).getString(1) == "newline\nand\ttab")
    assert(back(3).getString(1) == "unicode é中文")
    assert(back(4).isNullAt(1) && back(4).isNullAt(2))
    assert(back(5).getString(1) == "")
  }

  test("one shard per partition; read parallelizes per shard") {
    val df = (1L to 100L).toDF("id").repartition(5)
    val dir = tmp()
    ZstdJsonl.write(df, dir)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst"))
    assert(shards.length == 5)
    val idSchema = StructType(Seq(StructField("id", LongType)))
    val back = ZstdJsonl.read(spark, dir, idSchema)
    assert(back.rdd.getNumPartitions == 5)
    assert(back.agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) == 5050L)
  }

  test("shards really are zstd frames (magic) and compress the text") {
    val df = Seq.fill(200)("the same repeated line of corpus text")
      .toDF("text").repartition(1)
    val dir = tmp()
    ZstdJsonl.write(df, dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst")).head
    val head = Files.readAllBytes(f.toPath).take(4)
    // zstd frame magic 0xFD2FB528, little-endian on disk
    assert(head.map(_ & 0xff).toSeq == Seq(0x28, 0xb5, 0x2f, 0xfd))
    assert(f.length() < 1000) // 200 identical ~45-byte lines
  }

  test("corrupt frame fails loudly, never a silent short read") {
    val df = (1L to 1000L).toDF("id").repartition(1)
    val dir = tmp()
    ZstdJsonl.write(df, dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst")).head
    val bytes = Files.readAllBytes(f.toPath)
    // flip bytes in the middle of the compressed payload
    for (i <- bytes.length / 2 until bytes.length / 2 + 8)
      bytes(i) = (bytes(i) ^ 0x5a).toByte
    Files.write(f.toPath, bytes)
    val idSchema = StructType(Seq(StructField("id", LongType)))
    val e = intercept[org.apache.spark.SparkException] {
      ZstdJsonl.read(spark, dir, idSchema).count()
    }
    assert(e.getMessage != null)
  }

  test("malformed JSON line is loud under FAILFAST") {
    val dir = tmp()
    val df = Seq(1L, 2L).toDF("id").repartition(1)
    ZstdJsonl.write(df, dir)
    // append a shard holding a broken line
    val p = Paths.get(dir, "part-zzzzz.jsonl.zst")
    val out = new com.github.luben.zstd.ZstdOutputStream(
      Files.newOutputStream(p), 3)
    out.write("{\"id\": not-json}\n".getBytes("UTF-8"))
    out.close()
    val idSchema = StructType(Seq(StructField("id", LongType)))
    intercept[org.apache.spark.SparkException] {
      ZstdJsonl.read(spark, dir, idSchema).count()
    }
  }

  test("empty directory is loud") {
    val dir = tmp()
    intercept[IllegalArgumentException] {
      ZstdJsonl.read(spark, dir,
        StructType(Seq(StructField("id", LongType))))
    }
  }
}
