package graft.sources

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** F14k/F14l (r12): the Delta change feed as a streaming source —
  * follow-the-log (a commit landing AFTER the first drain surfaces in
  * the next), per-commit admission, and timestampAsOf resolution.
  */
class DeltaCdfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def writeFile(t: Path, rel: String, rows: Seq[(Long, String)]): Unit = {
    val tmp = Files.createTempDirectory("cdf_part")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val st = Files.list(tmp)
    val part = try st.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    finally st.close()
    Files.createDirectories(t.resolve(rel).getParent)
    Files.move(part, t.resolve(rel))
    DeltaLog.deleteTmp(tmp)
  }

  private def commit(t: Path, v: Long, lines: Seq[String]): Unit =
    Files.writeString(t.resolve("_delta_log").resolve(f"$v%020d.json"),
      lines.mkString("\n"))

  private def mkTable(): Path = {
    val t = Files.createTempDirectory("deltacdf")
    Files.createDirectories(t.resolve("_delta_log"))
    writeFile(t, "f0.parquet", Seq((1L, "a"), (2L, "b")))
    commit(t, 0L, Seq(
      s"""{"metaData":{"id":"cdf","schemaString":"${esc(schema.json)}","partitionColumns":[],"configuration":{"delta.enableChangeDataFeed":"true"}}}""",
      """{"add":{"path":"f0.parquet","partitionValues":{},"dataChange":true}}"""))
    writeFile(t, "f1.parquet", Seq((3L, "c")))
    commit(t, 1L, Seq(
      """{"add":{"path":"f1.parquet","partitionValues":{},"dataChange":true}}"""))
    t
  }

  test("streamed feed follows the log: a commit after the first drain arrives") {
    val t = mkTable()
    val name = s"cdfspec_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.DeltaCdfProvider")
      .option("table", t.toString)
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      q.processAllAvailable()
      // startingVersion is EXCLUSIVE (v0 = the base snapshot, exactly
      // the batch feed's contract): only v1's insert so far
      val afterFirst = spark.table(name).collect()
      assert(afterFirst.length == 1, s"v1 changes: ${afterFirst.length}")
      // a NEW commit lands while the stream is running
      writeFile(t, "f2.parquet", Seq((4L, "d")))
      commit(t, 2L, Seq(
        """{"add":{"path":"f2.parquet","partitionValues":{},"dataChange":true}}"""))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select(col("id"), col("_change_type"), col("_commit_version"))
        .as[(Long, String, Long)].collect().toSet
      assert(rows == Set((3L, "insert", 1L), (4L, "insert", 2L)),
        rows.toString)
    } finally q.stop()
  }

  test("streamed feed equals the batch feed bit-for-bit (deletes included)") {
    val t = mkTable()
    // v2 deletes id=2 by rewriting f0
    writeFile(t, "f0b.parquet", Seq((1L, "a")))
    commit(t, 2L, Seq(
      """{"remove":{"path":"f0.parquet","dataChange":true}}""",
      """{"add":{"path":"f0b.parquet","partitionValues":{},"dataChange":true}}"""))
    val name = s"cdfspec_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.DeltaCdfProvider")
      .option("table", t.toString).option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name)
      .select(col("id"), col("v"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, String, Long)].collect().sorted.toSeq
    val batch = DeltaLog.tableChangesByVersion(spark, t.toString, 0L, 2L)
      .select(col("id"), col("v"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, String, Long)].collect().sorted.toSeq
    assert(streamed == batch)
    assert(streamed.contains((2L, "b", "delete", 2L)))
  }

  test("startingVersion skips the prefix") {
    val t = mkTable()
    val name = s"cdfspec_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.DeltaCdfProvider")
      .option("table", t.toString).option("startingVersion", "0")
      .load()
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    // startingVersion=0 means changes AFTER v0: only v1's insert
    val ids = spark.table(name).select("id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("tableChangesCdf: derived inserts, derived deletes, loud mixed commit") {
    val t = mkTable() // v0 adds f0 (2 rows), v1 adds f1 (1 row) — no cdc
    val all = DeltaLog.tableChangesCdf(spark, t.toString, -1L, 1L)
      .select(col("id"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, Long)].collect().toSet
    assert(all == Set((1L, "insert", 0L), (2L, "insert", 0L),
      (3L, "insert", 1L)), all.toString)
    // v2: remove-only commit → deletes derived from the removed file
    commit(t, 2L, Seq(
      """{"remove":{"path":"f1.parquet","dataChange":true}}"""))
    val dels = DeltaLog.tableChangesCdf(spark, t.toString, 1L, 2L)
      .select(col("id"), col("_change_type")).as[(Long, String)]
      .collect().toSet
    assert(dels == Set((3L, "delete")))
    // v3: mixed add+remove WITHOUT cdc → cannot be derived, loud
    writeFile(t, "f2.parquet", Seq((9L, "z")))
    commit(t, 3L, Seq(
      """{"remove":{"path":"f0.parquet","dataChange":true}}""",
      """{"add":{"path":"f2.parquet","partitionValues":{},"dataChange":true}}"""))
    val e = intercept[IllegalArgumentException] {
      DeltaLog.tableChangesCdf(spark, t.toString, 2L, 3L).collect()
    }
    assert(e.getMessage.contains("cannot be derived exactly"))
  }

  test("CDF-enabled deleteWithDv records only the NEWLY deleted rows") {
    val t = Files.createTempDirectory("deltacdfw")
    Files.createDirectories(t.resolve("_delta_log"))
    writeFile(t, "f0.parquet", (1L to 6L).map(i => (i, s"r$i")))
    commit(t, 0L, Seq(
      s"""{"metaData":{"id":"w","schemaString":"${esc(schema.json)}","partitionColumns":[],"configuration":{"delta.enableChangeDataFeed":"true"}}}""",
      """{"add":{"path":"f0.parquet","partitionValues":{},"dataChange":true}}"""))
    DeltaLog.deleteWithDv(spark, t.toString, "f0.parquet",
      col("id") % 2 === 0)
    // second delete overlaps nothing new for evens; %3 adds id=3 only
    // NEW (6 is already gone) — the cdc file must carry 3 alone
    DeltaLog.deleteWithDv(spark, t.toString, "f0.parquet",
      col("id") % 3 === 0)
    val feed = DeltaLog.tableChangesCdf(spark, t.toString, 0L, 2L)
      .select(col("id"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, Long)].collect().toSet
    assert(feed == Set((2L, "delete", 1L), (4L, "delete", 1L),
      (6L, "delete", 1L), (3L, "delete", 2L)), feed.toString)
    // and the live read agrees with the feed's arithmetic
    assert(DeltaLog.read(spark, t.toString).select("id").as[Long]
      .collect().toSet == Set(1L, 5L))
  }

  test("feed=recorded streams the cdc actions (update images included)") {
    val t = Files.createTempDirectory("deltacdfr")
    Files.createDirectories(t.resolve("_delta_log"))
    writeFile(t, "f0.parquet", Seq((1L, "a"), (2L, "b")))
    commit(t, 0L, Seq(
      s"""{"metaData":{"id":"r","schemaString":"${esc(schema.json)}","partitionColumns":[],"configuration":{"delta.enableChangeDataFeed":"true"}}}""",
      """{"add":{"path":"f0.parquet","partitionValues":{},"dataChange":true}}"""))
    // v1: recorded update of id=2 (pre/post images in _change_data)
    writeFile(t, "f1.parquet", Seq((1L, "a"), (2L, "B")))
    val cdcSchema = org.apache.spark.sql.types.StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType))
    val images = Seq((2L, "b", "update_preimage"), (2L, "B", "update_postimage"))
      .toDF("id", "v", "_change_type")
    val tmp = Files.createTempDirectory("cdfr_cdc")
    images.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val st0 = Files.list(tmp)
    val part = try st0.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    finally st0.close()
    Files.createDirectories(t.resolve("_change_data"))
    Files.move(part, t.resolve("_change_data/cdc-r1.parquet"))
    DeltaLog.deleteTmp(tmp)
    commit(t, 1L, Seq(
      """{"remove":{"path":"f0.parquet","dataChange":true}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{},"dataChange":true}}""",
      """{"cdc":{"path":"_change_data/cdc-r1.parquet","partitionValues":{},"dataChange":false}}"""))
    val name = s"cdfrec_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.DeltaCdfProvider")
      .option("table", t.toString)
      .option("feed", "recorded")
      .option("startingVersion", "-1") // include v0's inserts
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table(name)
      .select(col("id"), col("v"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, String, Long)].collect().toSet
    assert(rows == Set(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),
      (2L, "b", "update_preimage", 1L), (2L, "B", "update_postimage", 1L)),
      rows.toString)
  }

  test("recorded feed requires delta.enableChangeDataFeed (r13)") {
    val t = Files.createTempDirectory("deltacdfoff")
    Files.createDirectories(t.resolve("_delta_log"))
    writeFile(t, "f0.parquet", Seq((1L, "a")))
    commit(t, 0L, Seq(
      s"""{"metaData":{"id":"off","schemaString":"${esc(schema.json)}","partitionColumns":[]}}""",
      """{"add":{"path":"f0.parquet","partitionValues":{},"dataChange":true}}"""))
    writeFile(t, "f1.parquet", Seq((2L, "b")))
    commit(t, 1L, Seq(
      """{"add":{"path":"f1.parquet","partitionValues":{},"dataChange":true}}"""))
    val e = intercept[IllegalArgumentException] {
      DeltaLog.tableChangesCdf(spark, t.toString, 0L, 1L)
    }
    assert(e.getMessage.contains("enableChangeDataFeed"), e.getMessage)
    // the snapshot diff stays available for non-CDF tables
    assert(DeltaLog.tableChangesByVersion(spark, t.toString, 0L, 1L)
      .count() == 1L)
  }

  test("remove-only commit on a partitioned table takes pv from the prior version (r13)") {
    val pSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("p", StringType)))
    val t = Files.createTempDirectory("deltacdfpv")
    Files.createDirectories(t.resolve("_delta_log"))
    writeFile(t, "p=a/f0.parquet", Seq((1L, "x"), (2L, "y")))
    commit(t, 0L, Seq(
      s"""{"metaData":{"id":"pv","schemaString":"${esc(pSchema.json)}","partitionColumns":["p"],"configuration":{"delta.enableChangeDataFeed":"true"}}}""",
      """{"add":{"path":"p=a/f0.parquet","partitionValues":{"p":"a"},"dataChange":true}}"""))
    // the remove OMITS partitionValues — exactly what this repo's own
    // compact/restore removes look like
    commit(t, 1L, Seq(
      """{"remove":{"path":"p=a/f0.parquet","dataChange":true}}"""))
    val feed = DeltaLog.tableChangesCdf(spark, t.toString, 0L, 1L)
      .select(col("id"), col("p"), col("_change_type"))
      .as[(Long, String, String)].collect().toSet
    assert(feed == Set((1L, "a", "delete"), (2L, "a", "delete")),
      s"partition values must come from the prior live entry: $feed")
  }

  test("DV-growth commit without recorded cdc derives deletes from the position delta (r13)") {
    val t = Files.createTempDirectory("deltacdfdv")
    Files.createDirectories(t.resolve("_delta_log"))
    writeFile(t, "f0.parquet", (1L to 6L).map(i => (i, s"r$i")))
    commit(t, 0L, Seq(
      s"""{"metaData":{"id":"g","schemaString":"${esc(schema.json)}","partitionColumns":[],"configuration":{"delta.enableChangeDataFeed":"true"}}}""",
      """{"add":{"path":"f0.parquet","partitionValues":{},"dataChange":true}}"""))
    // engine delete records cdc; STRIP it to simulate a foreign writer
    DeltaLog.deleteWithDv(spark, t.toString, "f0.parquet",
      col("id") % 2 === 0)
    val c1 = t.resolve("_delta_log").resolve(f"${1L}%020d.json")
    val kept = Files.readAllLines(c1).asScala.filterNot(_.contains("\"cdc\""))
    Files.writeString(c1, kept.mkString("\n"))
    val feed = DeltaLog.tableChangesCdf(spark, t.toString, 0L, 1L)
      .select(col("id"), col("_change_type")).as[(Long, String)]
      .collect().toSet
    assert(feed == Set((2L, "delete"), (4L, "delete"), (6L, "delete")),
      s"DV-growth deletes must not vanish: $feed")
    // a second, overlapping foreign DV delete: only the NEW position
    // surfaces (6 was already dead)
    DeltaLog.deleteWithDv(spark, t.toString, "f0.parquet",
      col("id") % 3 === 0)
    val c2 = t.resolve("_delta_log").resolve(f"${2L}%020d.json")
    val kept2 = Files.readAllLines(c2).asScala.filterNot(_.contains("\"cdc\""))
    Files.writeString(c2, kept2.mkString("\n"))
    val feed2 = DeltaLog.tableChangesCdf(spark, t.toString, 1L, 2L)
      .select(col("id"), col("_change_type")).as[(Long, String)]
      .collect().toSet
    assert(feed2 == Set((3L, "delete")), s"only the delta: $feed2")
  }

  test("versionAtTimestamp: monotonic adjustment and boundary semantics") {
    val t = mkTable()
    val log = t.resolve("_delta_log")
    val base = 1700000000000L
    Files.setLastModifiedTime(log.resolve(f"${0L}%020d.json"),
      FileTime.fromMillis(base))
    // clock skew: v1 stamped BEFORE v0 — adjustment carries v0's time
    Files.setLastModifiedTime(log.resolve(f"${1L}%020d.json"),
      FileTime.fromMillis(base - 5000L))
    assert(DeltaLog.versionAtTimestamp(t.toString, base) == 1L,
      "skewed v1 inherits v0's adjusted time, so base resolves past it")
    intercept[IllegalArgumentException] {
      DeltaLog.versionAtTimestamp(t.toString, base - 1L)
    }
    // normal clocks
    Files.setLastModifiedTime(log.resolve(f"${1L}%020d.json"),
      FileTime.fromMillis(base + 60000L))
    assert(DeltaLog.versionAtTimestamp(t.toString, base) == 0L)
    assert(DeltaLog.versionAtTimestamp(t.toString, base + 59999L) == 0L)
    assert(DeltaLog.versionAtTimestamp(t.toString, base + 60000L) == 1L)
    assert(DeltaLog.readAsOfTimestamp(spark, t.toString, base)
      .count() == 2L)
  }
}
