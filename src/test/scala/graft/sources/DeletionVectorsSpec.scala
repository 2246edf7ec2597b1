package graft.sources

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F14c: deletion vectors — Z85 golden vectors, the house Roaring
  * decoder against the CANONICAL RoaringBitmap library (Spark's own
  * classpath) across all three container types, the DV file wrapper's
  * integrity checks, and end-to-end DeltaLog reads with `u`/`i`
  * storage.
  */
class DeletionVectorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Z85 golden vector (the ZeroMQ spec 32 test case) and round-trip") {
    val bytes = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DeletionVectors.z85Encode(bytes) == "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").toSeq == bytes.toSeq)
    val rnd = Array.tabulate(32)(i => ((i * 37 + 11) % 256).toByte)
    assert(DeletionVectors.z85Decode(
      DeletionVectors.z85Encode(rnd)).toSeq == rnd.toSeq)
  }

  private def officialPortable(values: Seq[Long],
                               runOptimize: Boolean): Array[Byte] = {
    val rb = new org.roaringbitmap.longlong.Roaring64NavigableMap()
    values.foreach(rb.addLong)
    if (runOptimize) rb.runOptimize()
    val bos = new java.io.ByteArrayOutputStream()
    rb.serializePortable(new java.io.DataOutputStream(bos))
    bos.toByteArray
  }

  test("house decoder reads the canonical library's portable bytes: array containers") {
    val vals = Seq(1L, 3L, 5L, 100L, 65535L, 65536L, 70000L, (1L << 33) + 7)
    val got = DeletionVectors.decodePortable64(officialPortable(vals, false))
    assert(got.toSet == vals.toSet)
  }

  test("house decoder: run containers (runOptimize forces them)") {
    val vals = (1000L to 6000L) ++ (70000L to 70100L)
    val got = DeletionVectors.decodePortable64(
      officialPortable(vals, runOptimize = true))
    assert(got.toSet == vals.toSet)
  }

  test("house decoder: bitmap containers (dense, > 4096 per chunk)") {
    val vals = (0L until 20000L by 2) :+ (1L << 40)
    val got = DeletionVectors.decodePortable64(officialPortable(vals, false))
    assert(got.toSet == vals.toSet)
  }

  test("DV file wrapper verifies size, magic, and CRC loudly") {
    val bm = officialPortable(Seq(2L, 4L, 9L), false)
    val (file, offset, size) = DeletionVectors.dvFileBytes(bm)
    assert(DeletionVectors.decodeAt(file, offset, size).toSet ==
      Set(2L, 4L, 9L))
    // flipped bitmap bit -> CRC mismatch
    val bad = file.clone(); bad(file.length - 6) = (bad(file.length - 6) ^ 1).toByte
    intercept[IllegalArgumentException] {
      DeletionVectors.decodeAt(bad, offset, size)
    }
    // wrong declared size
    intercept[IllegalArgumentException] {
      DeletionVectors.decodeAt(file, offset, size - 1)
    }
    // bad version byte
    val badV = file.clone(); badV(0) = 2
    intercept[IllegalArgumentException] {
      DeletionVectors.decodeAt(badV, offset, size)
    }
  }

  /** A 2-commit Delta table whose second commit re-adds the data file
    * with a deletion vector over `deadPositions`, stored as requested.
    */
  private def dvTable(deadPositions: Seq[Long], inline: Boolean): String = {
    val t0 = Files.createTempDirectory("delta_dv")
    val df = (0L until 20L).toDF("k").withColumn("v", col("k") * 10)
      .orderBy("k").coalesce(1)
    Files.createDirectories(t0.resolve("data"))
    df.write.mode("overwrite").parquet(t0.resolve("staging").toString)
    val part = Files.list(t0.resolve("staging")).iterator()
    val dataFile = {
      var f: java.nio.file.Path = null
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) f = p
      }
      Files.move(f, t0.resolve("data/f0.parquet"))
      "data/f0.parquet"
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v BIGINT")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val logDir = t0.resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.writeString(logDir.resolve(f"${0L}%020d.json"), Seq(
      s"""{"metaData":{"id":"dv","schemaString":"${esc(schema.json)}","partitionColumns":[]}}""",
      s"""{"add":{"path":"$dataFile","partitionValues":{},"dataChange":true}}""")
      .mkString("\n"))
    val bm = officialPortable(deadPositions, runOptimize = true)
    val dvField =
      if (inline) {
        // inline payload must be z85 (4-byte groups): pad, size bounds it
        val data = java.nio.ByteBuffer.allocate(4 + bm.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putInt(DeletionVectors.Magic).put(bm).array()
        val padded = java.util.Arrays.copyOf(data, (data.length + 3) / 4 * 4)
        s""""deletionVector":{"storageType":"i","pathOrInlineDv":"${DeletionVectors.z85Encode(padded)}","offset":1,"sizeInBytes":${data.length},"cardinality":${deadPositions.size}}"""
      } else {
        val (file, offset, size) = DeletionVectors.dvFileBytes(bm)
        val uuid = java.util.UUID.randomUUID()
        val ub = java.nio.ByteBuffer.allocate(16)
        ub.putLong(uuid.getMostSignificantBits)
        ub.putLong(uuid.getLeastSignificantBits)
        Files.write(t0.resolve(s"deletion_vector_$uuid.bin"), file)
        s""""deletionVector":{"storageType":"u","pathOrInlineDv":"${DeletionVectors.z85Encode(ub.array())}","offset":$offset,"sizeInBytes":$size,"cardinality":${deadPositions.size}}"""
      }
    Files.writeString(logDir.resolve(f"${1L}%020d.json"),
      s"""{"add":{"path":"$dataFile","partitionValues":{},"dataChange":false,$dvField}}""")
    t0.toString
  }

  test("DeltaLog read applies a 'u'-stored deletion vector") {
    val dead = Seq(0L, 3L, 7L, 19L)
    val got = DeltaLog.read(spark, dvTable(dead, inline = false))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) == (0L until 20L).filterNot(dead.contains))
    assert(got.forall { case (k, v) => v == k * 10 })
  }

  test("DeltaLog read applies an inline deletion vector") {
    val dead = Seq(1L, 2L, 4L, 8L, 16L)
    val got = DeltaLog.read(spark, dvTable(dead, inline = true))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) == (0L until 20L).filterNot(dead.contains))
  }

  test("time travel to the pre-DV version sees every row") {
    val dead = Seq(5L, 6L)
    val table = dvTable(dead, inline = false)
    val v0 = DeltaLog.read(spark, table, versionAsOf = Some(0L))
    assert(v0.count() == 20L)
    assert(DeltaLog.read(spark, table).count() == 18L)
  }
}
