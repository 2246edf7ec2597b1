package graft.layout

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HilbertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hvalue is a bijective walk: order-2 grid indices are a permutation of 0..15") {
    val ds = for (x <- 0L until 4L; y <- 0L until 4L) yield Hilbert.hvalueRef(x, y, 2)
    assert(ds.sorted == (0L until 16L))
  }

  test("hvalue is CONTINUOUS: consecutive indices are grid neighbors (unlike Z-order)") {
    val bits = 5 // 32x32 grid, exhaustive
    val n = 1 << bits
    val byD = (for (x <- 0L until n; y <- 0L until n)
      yield Hilbert.hvalueRef(x, y, bits) -> (x, y)).sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d-neighbors ($x1,$y1)->($x2,$y2)")
    }
    // Z-order jumps: (1,1)->(2,0) at d=3->4 has Manhattan distance 2
    val zByD = (for (x <- 0L until 4L; y <- 0L until 4L)
      yield ZOrder.zvalueRef(x, y, 2) -> (x, y)).sortBy(_._1).map(_._2)
    val zJumps = zByD.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0)
  }

  test("native expression matches the reference walk (eval and codegen)") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (4095L, 4095L),
      (2731L, 1365L), (17L, 4000L))
    val df = cases.toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.hvalue(col("x"), col("y"), 12).as("h"))
    df.as[(Long, Long, Long)].collect().foreach { case (x, y, h) =>
      assert(h == Hilbert.hvalueRef(x, y, 12), s"($x,$y)")
    }
    assertThrows[Exception] {
      Seq((-1L, 0L)).toDF("x", "y")
        .select(Hilbert.hvalue(col("x"), col("y"), 12)).collect()
    }
  }

  test("hilbert chunks have tighter bounding boxes than z-order at non-power-of-4 chunk sizes") {
    // every cell of a 64x64 grid, split into consecutive key-order chunks of
    // 100 cells (not a power of 4, so quadrant alignment can't mask jumps);
    // a chunk's box area measures how compact a file's (x,y) footprint is
    val bits = 6
    val n = 1L << bits
    val cells = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    def avgBoxArea(key: (Long, Long) => Long): Double = {
      val chunks = cells.sortBy { case (x, y) => key(x, y) }.grouped(100).toSeq
      chunks.map { c =>
        val xs = c.map(_._1); val ys = c.map(_._2)
        (xs.max - xs.min + 1).toDouble * (ys.max - ys.min + 1)
      }.sum / chunks.size
    }
    val h = avgBoxArea(Hilbert.hvalueRef(_, _, bits))
    val z = avgBoxArea(ZOrder.zvalueRef(_, _, bits))
    assert(h < z, s"hilbert avg box $h should beat z-order $z")
  }

  test("hilbert-clustered files prune 2-D range predicates like z-order") {
    val m = 50000
    val rnd = new scala.util.Random(47)
    val rows = Seq.fill(m)((rnd.nextLong(4096), rnd.nextLong(4096))).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_hilbert").toString
    ZOrder.writeClustered(rows, dir, Hilbert.hvalue(col("x"), col("y"), 12), 64)
    val stats = ZOrder.fileStats(spark, dir, Seq("x", "y")).cache()
    val box = Map("x" -> (1000L, 1300L), "y" -> (2000L, 2300L))
    val (sel, tot, df) = ZOrder.prunedScan(spark, dir, stats, box)
    assert(tot == 64 && sel <= 16, s"read $sel of $tot files")
    val expect = rows.filter(col("x").between(1000, 1300) &&
      col("y").between(2000, 2300)).count()
    assert(df.count() == expect)
  }
}
