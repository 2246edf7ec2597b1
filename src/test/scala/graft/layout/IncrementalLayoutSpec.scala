package graft.layout

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F11: incremental Z-order + manifest maintenance. */
class IncrementalLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture(n: Int) =
    (0 until n).map(i => (i.toLong, (i * 37 % 500).toLong, s"v$i"))
      .toDF("id", "x", "payload")

  test("append extends the layout without touching base files") {
    val dir = java.nio.file.Files.createTempDirectory("zinc_spec").toString
    val data = s"$dir/data"
    val z = ZOrder.zvalue(pmod(col("x"), lit(4096)), pmod(col("id"), lit(4096)), 12)
    ZOrder.writeClustered(fixture(2000).filter(col("id") % 5 =!= 0), data, z, 6)
    val baseFiles = new java.io.File(data).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap

    val newFiles = ZOrder.appendClustered(
      fixture(2000).filter(col("id") % 5 === 0), data, z, 2)
    assert(newFiles.nonEmpty && newFiles.forall(f => !baseFiles.contains(new java.io.File(f).getName)))
    val after = new java.io.File(data).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(baseFiles.forall { case (n, m) => after(n) == m },
      "base files must be untouched by the append")
    // no rows lost or duplicated
    assert(spark.read.parquet(data).count() == 2000L)
  }

  test("incremental manifest == rebuilt manifest; pruned scan exact and pruning") {
    val dir = java.nio.file.Files.createTempDirectory("zinc_spec2").toString
    val data = s"$dir/data"
    val root = s"$dir/manifest"
    val z = ZOrder.zvalue(pmod(col("x"), lit(4096)), pmod(col("id"), lit(4096)), 12)
    val all = fixture(4000)
    ZOrder.writeClustered(all.filter(col("id") % 5 =!= 0), data, z, 8)
    FileManifest.commitVersion(
      FileManifest.build(spark, data, Seq("x", "id"), Nil), root)
    val newFiles = ZOrder.appendClustered(all.filter(col("id") % 5 === 0), data, z, 2)
    val v2 = FileManifest.appendVersion(spark, root,
      FileManifest.buildFiles(spark, newFiles, Seq("x", "id"), Nil))
    assert(v2 == 2L && FileManifest.versions(root) == Seq(1L, 2L))

    // incremental union ≡ full rebuild (same rows, keyed by file)
    val inc = FileManifest.readVersion(spark, root).orderBy("file")
      .collect().toSeq
    val rebuilt = FileManifest.build(spark, data, Seq("x", "id"), Nil)
      .orderBy("file").collect().toSeq
    assert(inc == rebuilt, "incremental manifest must equal a rebuild")

    // v1 time travel still sees only the base files
    assert(FileManifest.readVersion(spark, root, 1L).count() ==
      inc.size - newFiles.size)

    // pruned scan: exact result + actual file skipping
    val (sel, tot, df) = FileManifest.prunedScan(spark, data,
      FileManifest.readVersion(spark, root),
      ranges = Map("x" -> (0L, 60L), "id" -> (0L, 900L)),
      equalities = Map.empty)
    val got = df.select("id").as[Long].collect().sorted.toSeq
    val want = all.filter(col("x").between(0, 60) && col("id").between(0, 900))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want, "pruned scan must equal the plain filter")
    assert(sel < tot, s"expected pruning, got $sel/$tot files")
  }
}
