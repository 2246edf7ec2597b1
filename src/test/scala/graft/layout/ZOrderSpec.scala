package graft.layout

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zvalue matches the reference interleave, eval and codegen") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (4095L, 4095L), (2731L, 1365L))
    val df = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y"), 12).as("z"))
    df.as[(Long, Long, Long)].collect().foreach { case (x, y, z) =>
      assert(z == ZOrder.zvalueRef(x, y, 12), s"($x,$y)")
    }
    // spot-check the classic: interleave(0b11, 0b00)=0b0101=5, (0b00,0b11)=0b1010=10
    assert(ZOrder.zvalueRef(3, 0, 12) == 5L && ZOrder.zvalueRef(0, 3, 12) == 10L)
  }

  test("z-clustered layout prunes files on BOTH dimensions; linear only on one") {
    val n = 100000
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(n)((rnd.nextLong(4096), rnd.nextLong(4096))).toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_linear").toString
    ZOrder.writeClustered(rows, zDir, ZOrder.zvalue(col("x"), col("y"), 12), 64)
    // linear baseline: same file count, clustered on x alone
    rows.repartitionByRange(64, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(linDir)

    val zStats = ZOrder.fileStats(spark, zDir, Seq("x", "y")).cache()
    val linStats = ZOrder.fileStats(spark, linDir, Seq("x", "y")).cache()

    // y-only box: the case column-linear layouts cannot skip
    val yBox = Map("y" -> (100L, 200L))
    val (zSel, zTot, zDf) = ZOrder.prunedScan(spark, zDir, zStats, yBox)
    val (linSel, linTot, _) = ZOrder.prunedScan(spark, linDir, linStats, yBox)
    assert(zTot == 64 && linTot == 64)
    assert(linSel == 64, "x-sorted layout reads every file for a y predicate")
    assert(zSel <= 24, s"z layout should skip most files, read $zSel")
    // correctness: pruned scan == full filter
    val expect = rows.filter(col("y") >= 100 && col("y") <= 200).count()
    assert(zDf.count() == expect)

    // 2-D box: z prunes to a handful
    val box = Map("x" -> (1000L, 1200L), "y" -> (2000L, 2200L))
    val (zSel2, _, zDf2) = ZOrder.prunedScan(spark, zDir, zStats, box)
    assert(zSel2 <= 16, s"2-D box read $zSel2 of 64")
    val expect2 = rows.filter(
      col("x").between(1000, 1200) && col("y").between(2000, 2200)).count()
    assert(zDf2.count() == expect2)
  }

  test("n-ary zvalue: binary case matches ZValue; 3-D interleave positions correct") {
    val df = Seq((5L, 3L, 6L)).toDF("x", "y", "w")
    val (z2n, z2, z3) = df.select(
        ZOrder.zvalueN(Seq(col("x"), col("y")), 12).as("a"),
        ZOrder.zvalue(col("x"), col("y"), 12).as("b"),
        ZOrder.zvalueN(Seq(col("x"), col("y"), col("w")), 12).as("c"))
      .as[(Long, Long, Long)].head()
    assert(z2n == z2)
    assert(z3 == ZOrder.zvalueNRef(Seq(5L, 3L, 6L), 12))
    // bit (i*3 + c) = bit i of col c: x=0b101, y=0b011, w=0b110
    // i=0: x:1 y:1 w:0 → 0b011; i=1: x:0 y:1 w:1 → 0b110; i=2: x:1 y:0 w:1 → 0b101
    assert(z3 == (3L | (6L << 3) | (5L << 6)))
  }

  test("3-D z-clustering prunes on the third dimension too") {
    val n = 60000
    val rnd = new scala.util.Random(32)
    val rows = Seq.fill(n)((rnd.nextLong(1024), rnd.nextLong(1024), rnd.nextLong(1024)))
      .toDF("x", "y", "w")
    val dir = java.nio.file.Files.createTempDirectory("graft_z3").toString
    ZOrder.writeClustered(rows, dir,
      ZOrder.zvalueN(Seq(col("x"), col("y"), col("w")), 10), 64)
    val stats = ZOrder.fileStats(spark, dir, Seq("x", "y", "w"))
    val (sel, tot, df) = ZOrder.prunedScan(spark, dir, stats,
      Map("w" -> (100L, 200L)))
    assert(tot == 64 && sel < 48, s"w-only predicate read $sel of $tot")
    assert(df.count() == rows.filter(col("w").between(100, 200)).count())
  }

  test("point lookup via the stats manifest reads one file from a key-sorted layout") {
    val n = 80000
    val rows = spark.range(n).selectExpr("id AS k", "id * 7 AS payload")
    val dir = java.nio.file.Files.createTempDirectory("graft_ptlookup").toString
    rows.repartitionByRange(32, col("k")).sortWithinPartitions(col("k"))
      .write.mode("overwrite").parquet(dir)
    val stats = ZOrder.fileStats(spark, dir, Seq("k"))
    // equality = a zero-width range against the same manifest machinery
    val (sel, tot, df) = ZOrder.prunedScan(spark, dir, stats, Map("k" -> (42L, 42L)))
    assert(tot == 32 && sel == 1, s"point lookup read $sel of $tot files")
    assert(df.select("payload").as[Long].collect().toSeq == Seq(294L))
  }

  test("per-file bloom index prunes equality probes on a non-clustered column") {
    val n = 65536
    // balanced 8-bit dims; tag is a band of 8 consecutive y values. The
    // z-layout keeps each file inside a bounded (x, y) rectangle, so any
    // one tag touches few files — but min/max stats on (x, y) know
    // nothing about tag, so only the bloom can skip
    val rows = spark.range(n).selectExpr(
      "id % 256 AS x", "id div 256 AS y",
      "concat('t', (id div 256) div 8) AS tag")
    val dir = java.nio.file.Files.createTempDirectory("graft_zbloom").toString
    ZOrder.writeClustered(rows, dir, ZOrder.zvalue(col("x"), col("y"), 8), 32)
    val idx = ZOrder.fileBloomIndex(spark, dir, "tag").cache()
    val (sel, tot, df) = ZOrder.bloomPrunedScan(spark, dir, idx, "tag", "t3")
    assert(tot == 32, s"expected 32 files, got $tot")
    assert(sel < tot / 2, s"bloom probe should skip most files, read $sel of $tot")
    // no false negatives: pruned scan == full-scan filter, exactly
    val expect = spark.read.parquet(dir).filter(col("tag") === "t3").count()
    assert(df.count() == expect && expect == 8L * 256)
    // absent value: a bloom may false-positive a few files, never miss
    val (selNone, _, dfNone) = ZOrder.bloomPrunedScan(spark, dir, idx, "tag", "absent")
    assert(dfNone.count() == 0 && selNone <= 4, s"absent value read $selNone files")
    // type-mismatched probe: an index over BIGINT probed with a Scala Int
    // must still find every row (xxhash64 is input-type-sensitive; the
    // probe is cast to the indexed column's type)
    val idxY = ZOrder.fileBloomIndex(spark, dir, "y").cache()
    val (selY, _, dfY) = ZOrder.bloomPrunedScan(spark, dir, idxY, "y", 37)
    assert(dfY.count() == 256 && selY >= 1, s"Int probe of BIGINT column: ${dfY.count()}")
  }

  test("zvalue/zvalueN: interpreted eval matches codegen (wholeStage off vs on)") {
    val rnd = new scala.util.Random(33)
    val rows = Seq.fill(200)((rnd.nextLong(4096), rnd.nextLong(4096), rnd.nextLong(4096)))
    def run(codegen: Boolean): Seq[(Long, Long)] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      import s.implicits._
      rows.toDF("x", "y", "w")
        .select(ZOrder.zvalue(col("x"), col("y"), 12).as("z2"),
          ZOrder.zvalueN(Seq(col("x"), col("y"), col("w")), 12).as("z3"))
        .as[(Long, Long)].collect().toSeq
    }
    assert(run(codegen = true) == run(codegen = false))
  }

  test("zvalue rejects negative inputs") {
    val e = intercept[Exception](
      Seq((-1L, 2L)).toDF("x", "y")
        .select(ZOrder.zvalue(col("x"), col("y"), 12)).collect())
    assert(e.getMessage != null)
  }
}
