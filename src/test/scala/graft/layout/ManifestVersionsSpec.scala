package graft.layout

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F10: versioned manifest snapshots — time travel until vacuum, and a
  * vacuum that can never delete a file a retained version references.
  */
class ManifestVersionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): (String, String) = {
    val data = java.nio.file.Files.createTempDirectory("graft_mv_data").toString
    val root = java.nio.file.Files.createTempDirectory("graft_mv_meta").toString
    (data, root)
  }

  private def write(dir: String, tag: String, n: Int): Unit =
    (1 to n).map(i => (i.toLong, i.toLong * 2, s"${tag}_$i")).toDF("x", "y", "tag")
      .repartition(4).write.mode("append").parquet(dir)

  private def files(m: org.apache.spark.sql.DataFrame): Set[String] =
    m.select("file").as[String].collect().toSet

  test("commits are monotone and readVersion time-travels") {
    val (data, root) = freshTable()
    write(data, "a", 100)
    val v1 = FileManifest.commitVersion(
      FileManifest.build(spark, data, Seq("x"), Seq("tag")), root)
    write(data, "b", 100)
    val v2 = FileManifest.commitVersion(
      FileManifest.build(spark, data, Seq("x"), Seq("tag")), root)
    assert(v1 == 1L && v2 == 2L && FileManifest.versions(root) == Seq(1L, 2L))
    val f1 = files(FileManifest.readVersion(spark, root, v1))
    val f2 = files(FileManifest.readVersion(spark, root, v2))
    assert(f1.subsetOf(f2) && f2.size > f1.size,
      "append grew the file set; v1 still sees only the old files")
    assert(files(FileManifest.readVersion(spark, root)) == f2, "-1 = latest")
  }

  test("vacuum retires old versions but never a retained version's files") {
    val (data, root) = freshTable()
    write(data, "a", 100)
    FileManifest.commitVersion(
      FileManifest.build(spark, data, Seq("x"), Seq("tag")), root)
    // simulate a rewrite: new files, THEN a manifest that references only
    // them (the old files become v1-only)
    val rewritten = spark.read.parquet(data)
    val data2 = java.nio.file.Files.createTempDirectory("graft_mv_data2").toString
    rewritten.repartition(2).write.mode("overwrite").parquet(data2)
    FileManifest.commitVersion(
      FileManifest.build(spark, data2, Seq("x"), Seq("tag")), root)
    val keepFiles = files(FileManifest.readVersion(spark, root, 2L))
    val (retired, deleted) = FileManifest.vacuum(spark, root, keepLast = 1)
    assert(retired == Seq(1L) && deleted > 0L)
    assert(FileManifest.versions(root) == Seq(2L))
    // every retained-version file still exists and still reads
    keepFiles.foreach { f =>
      val p = if (f.startsWith("file:"))
        new java.io.File(new java.net.URI(f).getPath) else new java.io.File(f)
      assert(p.exists, s"retained file deleted: $f")
    }
    assert(spark.read.parquet(data2).count() == 100L)
    // idempotent: nothing left to collect
    assert(FileManifest.vacuum(spark, root, keepLast = 1) == ((Seq.empty, 0L)))
  }

  test("a version shared between snapshots protects shared files") {
    val (data, root) = freshTable()
    write(data, "a", 50)
    FileManifest.commitVersion(
      FileManifest.build(spark, data, Seq("x"), Seq("tag")), root)
    write(data, "b", 50) // append: v2 references v1's files TOO
    FileManifest.commitVersion(
      FileManifest.build(spark, data, Seq("x"), Seq("tag")), root)
    val (retired, deleted) = FileManifest.vacuum(spark, root, keepLast = 1)
    assert(retired == Seq(1L) && deleted == 0L,
      "every v1 file is still referenced by v2 — nothing may die")
    assert(spark.read.parquet(data).count() == 100L)
  }
}
