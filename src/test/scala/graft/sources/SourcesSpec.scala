package graft.sources

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sample = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))

  test("parquet/orc/csv/json round-trip values and column names") {
    val df = sample.toDF("id", "name", "amount")
    Seq("parquet", "orc", "csv", "json").foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft_src_$fmt").toString + "/t"
      Sink.write(df, dir, fmt)
      val back = Sink.read(spark, dir, fmt)
        .select(col("id").cast("long"), col("name"), col("amount").cast("double"))
        .as[(Long, String, Double)].collect().toSet
      assert(back == sample.toSet, s"round-trip failed for $fmt")
    }
  }

  test("partitioned write prunes at read time (PartitionFilters, file subset)") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    Sink.writePartitioned(events, dir, Seq("event_type"))
    val all = spark.read.parquet(dir)
    val clicks = all.filter(col("event_type") === "click")
    clicks.collect()
    val plan = clicks.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      "partition filter must prune directories, not scan rows")
    // only the click partition's files are read (scan metric, post-exec)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = clicks.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f }.head
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead < all.inputFiles.length,
      s"read $filesRead of ${all.inputFiles.length} files — no pruning")
    assert(clicks.count() ==
      graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
        .filter(col("event_type") === "click").count())
  }

  test("compaction collapses a many-small-files table, same rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.repartition(40).write.mode("overwrite").parquet(dir) // 40 tiny files
    val before = spark.read.parquet(dir)
    val beforeRows = before.count()
    assert(before.inputFiles.length == 40)
    val written = Sink.compactParquet(spark, dir, targetFileBytes = 512L * 1024)
    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length.toLong == written)
    assert(after.inputFiles.length < 40, "file count must shrink")
    assert(after.count() == beforeRows, "no rows may be lost")
  }

  test("compaction refuses partitioned layouts instead of duplicating rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_part").toString
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    Sink.writePartitioned(events, dir, Seq("event_type"))
    val e = intercept[IllegalArgumentException](Sink.compactParquet(spark, dir))
    assert(e.getMessage.contains("partition subdirectories"))
  }

  /** Stage a mid-swap crash: originals + (some) compacted-* copies + the
    * manifest, exactly what a kill between rename and delete leaves.
    */
  private def stageCrash(dir: String, copyN: Int): Long = {
    import java.nio.file.{Files => F, Paths}
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.repartition(4).write.mode("overwrite").parquet(dir)
    val rows = spark.read.parquet(dir).count()
    val originals = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val finalNames = originals.zipWithIndex.map { case (f, i) => s"compacted-$i-${f.getName}" }
    originals.take(copyN).zip(finalNames).foreach { case (f, n) =>
      F.copy(f.toPath, Paths.get(dir, n))
    }
    val w = new java.io.PrintWriter(new java.io.File(dir, ".compact_manifest"))
    try {
      originals.foreach(f => w.println(s"D ${f.getName}"))
      finalNames.foreach(n => w.println(s"K $n"))
    } finally w.close()
    rows
  }

  test("interrupted compaction rolls FORWARD when the compacted set is complete") {
    val dir = java.nio.file.Files.createTempDirectory("graft_crash_fwd").toString
    val rows = stageCrash(dir, copyN = 4) // all 4 copied → duplicates on disk
    assert(spark.read.parquet(dir).count() == 2 * rows, "crash state = duplicated")
    Sink.compactParquet(spark, dir)
    assert(spark.read.parquet(dir).count() == rows, "recovery must dedup, then compact")
    assert(!new java.io.File(dir, ".compact_manifest").exists())
  }

  test("interrupted compaction rolls BACK when the compacted set is partial") {
    val dir = java.nio.file.Files.createTempDirectory("graft_crash_bak").toString
    val rows = stageCrash(dir, copyN = 2) // rename died halfway
    Sink.compactParquet(spark, dir)
    assert(spark.read.parquet(dir).count() == rows,
      "recovery must drop the partial compacted files, never the originals")
    assert(!new java.io.File(dir, ".compact_manifest").exists())
  }

  test("a torn D-only manifest rolls BACK — originals are never deleted") {
    // worst-case torn write: only delete lines survived, zero keeps.
    // Pre-fix this rolled FORWARD (keeps.forall vacuously true) and wiped
    // the dataset; it must leave the originals untouched.
    val dir = java.nio.file.Files.createTempDirectory("graft_crash_torn").toString
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.repartition(4).write.mode("overwrite").parquet(dir)
    val rows = spark.read.parquet(dir).count()
    val originals = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val w = new java.io.PrintWriter(new java.io.File(dir, ".compact_manifest"))
    try originals.foreach(f => w.println(s"D ${f.getName}")) finally w.close()
    Sink.compactParquet(spark, dir)
    assert(spark.read.parquet(dir).count() == rows,
      "torn manifest must roll back, not delete the originals")
    assert(!new java.io.File(dir, ".compact_manifest").exists())
  }

  test("a leftover manifest .tmp from a pre-rename crash is cleaned up") {
    val dir = java.nio.file.Files.createTempDirectory("graft_crash_tmp").toString
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.repartition(2).write.mode("overwrite").parquet(dir)
    val rows = spark.read.parquet(dir).count()
    val tmp = new java.io.File(dir, ".compact_manifest.tmp")
    val w = new java.io.PrintWriter(tmp)
    try w.println("D garbage") finally w.close()
    Sink.compactParquet(spark, dir)
    assert(spark.read.parquet(dir).count() == rows)
    assert(!tmp.exists())
  }
}
