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

  test("corrupted checksum rejects loudly") {
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
  }

  test("house reader decodes a system-tar PAX archive (>100-char path)") {
    // GNU tar --format=posix emits an 'x' extended header carrying the
    // full `path` for names over 100 bytes — the default in bsdtar and
    // in GNU tar on long paths, so real WebDataset shards hit it.
    val work = Paths.get(tmp())
    val longName = "p" * 150 + ".txt" // >100: ustar name field can't hold it
    Files.writeString(work.resolve(longName), "pax payload")
    Files.writeString(work.resolve("short.txt"), "short")
    val paxTar = work.resolve("pax.tar")
    val rc = new ProcessBuilder("tar", "--format=posix", "-cf",
      paxTar.toString, "-C", work.toString, longName, "short.txt")
      .inheritIO().start().waitFor()
    assert(rc == 0, "system tar failed")
    val got = TarShards.readTar(Files.newInputStream(paxTar))
      .map { case (n, p) => n -> new String(p, UTF_8) }.toMap
    assert(got(longName) == "pax payload")
    assert(got("short.txt") == "short")
    assert(got.size == 2)
  }

  test("house WRITER emits PAX for >100-byte names; system tar extracts them (r10)") {
    val dir = tmp()
    val longName = "nested/dirs/" + "q" * 120 + ".txt" // 132 bytes
    val pairs = Seq(longName -> "long-name payload", "short.txt" -> "s")
    TarShards.write(
      pairs.toDF("name", "v")
        .select(col("name"), encode(col("v"), "UTF-8").as("payload"))
        .coalesce(1), dir)
    // house reader round-trips the full name through its own PAX
    val back = TarShards.read(spark, dir)
      .select(col("name"), decode(col("payload"), "UTF-8").as("v"))
      .as[(String, String)].collect().toMap
    assert(back(longName) == "long-name payload")
    assert(back("short.txt") == "s")
    assert(back.size == 2)
    // and SYSTEM tar agrees: extraction restores the full path
    val shard = Files.list(Paths.get(dir)).iterator().asScala
      .find(f => f.getFileName.toString.startsWith("part-") &&
        !f.getFileName.toString.endsWith(".crc")).get
    val outDir = Paths.get(tmp())
    val rc = new ProcessBuilder("tar", "-xf", shard.toString,
      "-C", outDir.toString).inheritIO().start().waitFor()
    assert(rc == 0, "system tar could not extract the PAX shard")
    assert(Files.readString(outDir.resolve(longName)) == "long-name payload")
    assert(Files.readString(outDir.resolve("short.txt")) == "s")
  }

  test("PAX size override and global 'g' header are honored") {
    // Hand-build: a 'g' global header setting a default path, then an
    // 'x' header overriding SIZE for the next member whose ustar size
    // field lies (0) — the POSIX precedence chain x > g > ustar.
    def rec(k: String, v: String): Array[Byte] = {
      val body = s" $k=$v\n"
      // len includes its own decimal digits: fixed-point iterate
      var len = body.length + 1
      while ((len.toString.length + body.length) != len)
        len = len.toString.length + body.length
      (len.toString + body).getBytes(UTF_8)
    }
    val payload = "abcdefgh".getBytes(UTF_8)
    val bos = new java.io.ByteArrayOutputStream()
    def member(name: String, tf: Byte, data: Array[Byte],
        headerSize: Long = -1): Unit = {
      val h = TarShards.header(name,
        if (headerSize >= 0) headerSize else data.length)
      h(156) = tf
      // re-checksum after the typeflag patch
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L; var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      System.arraycopy((("0" * (6 - cs.length)) + cs + "\u0000 ").getBytes(UTF_8),
        0, h, 148, 8)
      bos.write(h); bos.write(data)
      val pad = (512 - data.length % 512) % 512
      if (pad > 0) bos.write(new Array[Byte](pad))
    }
    member("g.pax", 'g'.toByte, rec("path", "global-default.bin"))
    member("x.pax", 'x'.toByte, rec("size", payload.length.toString))
    // ustar size field LIES (0); the pax 'size' override must win
    member("lying-name.bin", '0'.toByte, payload, headerSize = 0)
    bos.write(new Array[Byte](1024))
    val got = TarShards.readTar(
      new java.io.ByteArrayInputStream(bos.toByteArray)).toList
    // 'x' had no path -> 'g' path wins over the ustar name; 'x' size taken
    assert(got.map { case (n, p) => (n, p.toSeq) } ==
      List(("global-default.bin", payload.toSeq)))
  }
}
