package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class ConformalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], alphaPpm: Long) =
    Conformal.splitConformal(rows.toDF("grp", "v", "id"),
        Seq("grp"), col("v"), col("id"), alphaPpm)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  /** Driver replay with the same h48 split and ceil-index quantile. */
  private def ref(rows: Seq[(String, Long, Long)], alphaPpm: Long) = {
    def h48(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val (cal, test) = rs.partition(r => h48(r._3) < (1L << 47))
      if (cal.isEmpty || test.isEmpty) None
      else {
        val s = cal.map(_._2).sum
        val enc = if (s >= 0) s / cal.size else -((-s) / cal.size)
        val resid = cal.map(r => (math.abs(r._2 - enc), r._3)).sorted.map(_._1)
        val n = cal.size.toLong
        val k = math.min(n, ((n + 1) * (1000000L - alphaPpm) + 999999) / 1000000)
        val q = resid((k - 1).toInt)
        val cov = test.count(r => math.abs(r._2 - enc) <= q).toLong
        Some(g -> ((n, test.size.toLong, q, cov,
          cov * 1000000L / test.size)))
      }
    }
  }

  test("coverage report matches the integer reference replay") {
    val rows = (1L to 40L).map(i => ("a", i * 10 + (i % 7), i)) ++
      (41L to 60L).map(i => ("b", 1000 - i, i))
    for (alpha <- Seq(1L, 100000L, 200000L, 500000L))
      assert(run(rows, alpha) == ref(rows, alpha), s"alpha=$alpha diverged")
  }

  test("near-zero alpha clamps the index to the max calibration residual") {
    val rows = (1L to 30L).map(i => ("a", i, i))
    val got = run(rows, 1L)
    assert(got == ref(rows, 1L).toMap)
    // shrinking alpha can only widen the interval (q monotone)
    assert(got("a")._3 >= run(rows, 500000L)("a")._3)
  }
}
