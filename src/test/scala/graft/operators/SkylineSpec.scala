package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def run(pts: Seq[(Long, Long)], buckets: Int = 1024): Set[(Long, Long)] = {
    val df = pts.toDF("x", "y")
    Skyline.skyline2d(df, col("x"), col("y"), buckets)
      .as[(Long, Long)].collect().toSet
  }

  /** Brute-force strict-dominance oracle. */
  private def ref(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    pts.filterNot { p =>
      pts.exists(q => q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2))
    }.toSet

  test("anti-chain survives whole, dominated points drop") {
    val pts = Seq((1L, 10L), (2L, 9L), (3L, 8L), (2L, 5L), (0L, 0L))
    assert(run(pts) == Set((1L, 10L), (2L, 9L), (3L, 8L)))
    assert(run(pts) == ref(pts))
  }

  test("equal-x tie rule: only the max y at a shared x survives") {
    val pts = Seq((2L, 9L), (2L, 7L), (5L, 3L))
    assert(run(pts) == Set((2L, 9L), (5L, 3L)))
  }

  test("equal-y across x: the lower-x copy is dominated") {
    val pts = Seq((1L, 8L), (3L, 8L))
    assert(run(pts) == Set((3L, 8L)))
  }

  test("duplicate frontier points do not dominate each other — all copies stay") {
    val df = Seq((3L, 8L), (3L, 8L), (1L, 9L)).toDF("x", "y")
    val got = Skyline.skyline2d(df, col("x"), col("y")).as[(Long, Long)]
      .collect().toSeq.sorted
    assert(got == Seq((1L, 9L), (3L, 8L), (3L, 8L)))
  }

  test("bucket count does not change the answer (1, 2, and many buckets)") {
    val pts = (0L until 200L).map(i => (i % 37, (i * 31) % 53))
    val expected = ref(pts)
    Seq(1, 2, 7, 4096).foreach { b =>
      assert(run(pts, b) == expected, s"buckets=$b diverged")
    }
  }

  test("single point and single-x-value inputs") {
    assert(run(Seq((5L, 5L))) == Set((5L, 5L)))
    assert(run(Seq((5L, 1L), (5L, 9L), (5L, 9L))) == Set((5L, 9L)))
  }
}
