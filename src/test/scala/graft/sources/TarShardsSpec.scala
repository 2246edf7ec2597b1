package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F19: the tar-shard codec — cross-validated BOTH ways against TWO
  * independent implementations: commons-compress (Spark's classpath)
  * and GNU tar (the system binary), plus checksum/subset boundaries.
  */
class TarShardsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("tar_spec").toString

  private val samples = Seq(
    "0001.txt" -> "hello world",
    "0001.json" -> """{"k":1}""",
    "0002.txt" -> "",
    "0002.json" -> """{"k":2,"pad":"xyz"}""")

  test("house writer round-trips through the house reader") {
    val dir = tmp()
    TarShards.write(
      samples.toDF("name", "v")
        .select(col("name"), encode(col("v"), "UTF-8").as("payload"))
        .coalesce(1), dir)
    val back = TarShards.read(spark, dir)
      .select(col("name"), decode(col("payload"), "UTF-8").as("v"))
      .as[(String, String)].collect().toSeq.sortBy(_._1)
    assert(back == samples.sortBy(_._1))
  }

  test("commons-compress reads the house shard (external decoder)") {
    val dir = tmp()
    TarShards.write(
      samples.toDF("name", "v")
        .select(col("name"), encode(col("v"), "UTF-8").as("payload"))
        .coalesce(1), dir)
    val shard = Files.list(Paths.get(dir)).iterator().asScala
      .find(f => f.getFileName.toString.startsWith("part-") &&
        !f.getFileName.toString.endsWith(".crc")).get
    val tin = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
      Files.newInputStream(shard))
    val got = Iterator.continually(tin.getNextEntry)
      .takeWhile(_ != null)
      .map { e =>
        val b = new Array[Byte](e.getSize.toInt)
        var o = 0
        while (o < b.length) o += tin.read(b, o, b.length - o)
        e.getName -> new String(b, UTF_8)
      }.toSeq
    tin.close()
    assert(got.sortBy(_._1) == samples.sortBy(_._1))
  }

  test("house reader reads a commons-compress shard (external encoder)") {
    val f = Paths.get(tmp(), "cc.tar")
    val tout = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      Files.newOutputStream(f))
    samples.foreach { case (n, v) =>
      val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(n)
      val b = v.getBytes(UTF_8)
      e.setSize(b.length)
      tout.putArchiveEntry(e)
      tout.write(b)
      tout.closeArchiveEntry()
    }
    tout.close()
    val got = TarShards.readTar(Files.newInputStream(f))
      .map { case (n, p) => n -> new String(p, UTF_8) }.toSeq
    assert(got.sortBy(_._1) == samples.sortBy(_._1))
  }

  test("house reader reads a GNU system-tar archive incl. an 'L' long name") {
    val work = Paths.get(tmp())
    val longName = "a" * 120 + ".txt" // > 100 chars: GNU emits an L entry
    Files.writeString(work.resolve("short.txt"), "short")
    Files.writeString(work.resolve(longName), "long payload")
    val tarFile = work.resolve("sys.tar")
    val rc = new ProcessBuilder("tar", "--format=gnu", "-cf",
      tarFile.toString, "-C", work.toString, "short.txt", longName)
      .inheritIO().start().waitFor()
    assert(rc == 0, "system tar failed")
    val got = TarShards.readTar(Files.newInputStream(tarFile))
      .map { case (n, p) => n -> new String(p, UTF_8) }.toMap
    assert(got("short.txt") == "short")
    assert(got(longName) == "long payload")
  }

  test("system tar extracts the house shard byte-identically") {
    val dir = tmp()
    TarShards.write(
      samples.toDF("name", "v")
        .select(col("name"), encode(col("v"), "UTF-8").as("payload"))
        .coalesce(1), dir)
    val shard = Files.list(Paths.get(dir)).iterator().asScala
      .find(f => f.getFileName.toString.startsWith("part-") &&
        !f.getFileName.toString.endsWith(".crc")).get
    val outDir = Paths.get(tmp())
    val rc = new ProcessBuilder("tar", "-xf", shard.toString,
      "-C", outDir.toString).inheritIO().start().waitFor()
    assert(rc == 0, "system tar could not extract the house shard")
    samples.foreach { case (n, v) =>
      assert(Files.readString(outDir.resolve(n)) == v, s"member $n diverged")
    }
  }

  test("multi-shard read parallelizes per shard and keys carry through") {
    val dir = tmp()
    val df = (0L until 60L).toDF("k")
      .select(concat(lpad(col("k").cast("string"), 4, "0"), lit(".txt")).as("name"),
        encode(concat(lit("payload-"), col("k")), "UTF-8").as("payload"))
      .repartition(4)
    TarShards.write(df, dir)
    val back = TarShards.read(spark, dir)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 60L)
    assert(back.select("shard").distinct().count() == 4L)
  }

  test("corrupted checksum and PAX headers reject loudly") {
    val dir = tmp()
    TarShards.write(
      samples.toDF("name", "v")
        .select(col("name"), encode(col("v"), "UTF-8").as("payload"))
        .coalesce(1), dir)
    val shard = Files.list(Paths.get(dir)).iterator().asScala
      .find(f => f.getFileName.toString.startsWith("part-") &&
        !f.getFileName.toString.endsWith(".crc")).get
    val bytes = Files.readAllBytes(shard)
    bytes(0) = 'z' // corrupt the first header's name -> checksum breaks
    val e1 = intercept[IllegalArgumentException] {
      TarShards.readTar(new java.io.ByteArrayInputStream(bytes)).toList
    }
    assert(e1.getMessage.contains("checksum"))
    // a PAX archive (posix format writes 'x' headers for long names)
    val work = Paths.get(tmp())
    val longName = "p" * 120 + ".txt"
    Files.writeString(work.resolve(longName), "pax")
    val paxTar = work.resolve("pax.tar")
    val rc = new ProcessBuilder("tar", "--format=posix", "-cf",
      paxTar.toString, "-C", work.toString, longName)
      .inheritIO().start().waitFor()
    assert(rc == 0)
    val e2 = intercept[IllegalArgumentException] {
      TarShards.readTar(Files.newInputStream(paxTar)).toList
    }
    assert(e2.getMessage.contains("PAX"))
  }
}
