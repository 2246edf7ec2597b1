package graft.layout

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FileManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Hilbert-clustered layout with a high-cardinality payload column the
  // clustering knows nothing about — the manifest must serve range
  // predicates on (x, y) via boxes AND point probes on tag via blooms.
  private lazy val (dir, rows) = {
    val m = 20000
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(m)((rnd.nextLong(4096), rnd.nextLong(4096)))
      .zipWithIndex.map { case ((x, y), i) => (x, y, s"tag_${i % 4999}") }
    val df = data.toDF("x", "y", "tag")
    val d = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    ZOrder.writeClustered(df, d, Hilbert.hvalue(col("x"), col("y"), 12), 32)
    (d, df)
  }
  private lazy val manifest =
    FileManifest.build(spark, dir, Seq("x", "y"), Seq("tag")).cache()

  test("one-pass manifest carries boxes and blooms per file") {
    assert(manifest.count() == 32)
    assert(manifest.columns.toSet ==
      Set("file", "min_x", "max_x", "min_y", "max_y", "bloom_tag"))
    val bloomSizes = manifest.select(size(col("bloom_tag"))).as[Int].collect()
    assert(bloomSizes.forall(s => s > 0 && s <= 4096))
  }

  test("range predicates prune by box and return exactly the matching rows") {
    val box = Map("x" -> (1000L, 1300L), "y" -> (2000L, 2300L))
    val (sel, tot, df) = FileManifest.prunedScan(spark, dir, manifest, box, Map.empty)
    assert(tot == 32 && sel < 32, s"read $sel of $tot files")
    val expect = rows.filter(col("x").between(1000, 1300) &&
      col("y").between(2000, 2300)).count()
    assert(df.count() == expect)
  }

  test("equality probes on the non-clustered column prune by bloom, no false negatives") {
    val probe = "tag_123" // 4-5 rows scattered across files
    val expect = rows.filter(col("tag") === probe)
      .select("x", "y").as[(Long, Long)].collect().toSet
    val (sel, tot, df) =
      FileManifest.prunedScan(spark, dir, manifest, Map.empty, Map("tag" -> probe))
    assert(sel < tot, s"bloom pruned nothing ($sel of $tot)")
    val got = df.select("x", "y").as[(Long, Long)].collect().toSet
    assert(got == expect, "bloom pruning must never lose a matching row")
  }

  test("a probe for an absent value selects (almost) no files") {
    val (sel, _, df) = FileManifest.prunedScan(spark, dir, manifest,
      Map.empty, Map("tag" -> "tag_99999"))
    assert(sel <= 2, s"absent probe still selected $sel files")
    assert(df.count() == 0)
  }

  test("combined box + bloom predicates intersect the file sets") {
    val box = Map("x" -> (0L, 2047L))
    val probe = Map[String, Any]("tag" -> "tag_123")
    val (selBoth, _, df) = FileManifest.prunedScan(spark, dir, manifest, box, probe)
    val (selBox, _, _) = FileManifest.prunedScan(spark, dir, manifest, box, Map.empty)
    val (selBloom, _, _) = FileManifest.prunedScan(spark, dir, manifest, Map.empty, probe)
    assert(selBoth <= math.min(selBox, selBloom))
    val expect = rows.filter(col("x") <= 2047 && col("tag") === "tag_123").count()
    assert(df.count() == expect)
  }
}
