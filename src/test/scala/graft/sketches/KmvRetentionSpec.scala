package graft.sketches

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvRetentionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Day-sketch table for (day, userRange) cohorts at parameter k. */
  private def daySketches(days: Seq[(Long, Range)], k: Int) =
    days.flatMap { case (d, us) => us.map(u => (d, u.toLong)) }
      .toDF("day", "user_id")
      .select(col("day"), Kmv.hash48(col("user_id")).as("h"))
      .groupBy(col("day")).agg(Kmv.kmvSketch(col("h"), k).as("sk"))

  private def run(days: Seq[(Long, Range)], k: Int, maxOffset: Int) =
    Kmv.retentionFromDaySketches(daySketches(days, k), k, maxOffset)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

  test("below-k days degenerate to exact set math") {
    // k = 256 > any cohort: estimates ARE the exact counts
    val days = Seq(0L -> (1 to 100), 1L -> (51 to 150), 2L -> (1 to 100))
    val got = run(days, k = 256, maxOffset = 2)
    assert(got((0L, 0L)) == ((100L, 100L, 1000000L)))
    assert(got((0L, 1L)) == ((100L, 50L, 500000L)), "half of day 0 returns on day 1")
    assert(got((0L, 2L)) == ((100L, 100L, 1000000L)), "day 2 re-activates all of day 0")
    assert(got((1L, 1L)) == ((100L, 50L, 500000L)))
  }

  test("the d = 0 diagonal is exactly 1e6 ppm even in estimation regime") {
    val days = Seq(0L -> (1 to 500), 1L -> (200 to 700))
    val got = run(days, k = 16, maxOffset = 1)
    assert(got((0L, 0L))._3 == 1000000L)
    assert(got((1L, 0L))._3 == 1000000L)
  }

  test("estimation regime matches the reference sketch algebra") {
    val k = 16
    val a = (1 to 500); val b = (200 to 700)
    val skOf = (r: Range) => r.foldLeft(Array.emptyLongArray) { (buf, u) =>
      Kmv.insert(buf, hash48Of(u.toLong), k)
    }
    val (skA, skB) = (skOf(a), skOf(b))
    val merged = Kmv.union(skA, skB, k)
    val unionEst = Kmv.estimate(merged, k)
    val xCommon = merged.count(h => skA.contains(h) && skB.contains(h)).toLong
    val interEst =
      if (merged.length < k) xCommon else xCommon * unionEst / k
    val cohortEst = Kmv.estimate(skA, k)
    val expectPpm = BigInt(interEst) * 1000000 / cohortEst
    val got = run(Seq(0L -> a, 1L -> b), k, maxOffset = 1)((0L, 1L))
    assert(got == ((cohortEst, interEst, expectPpm.toLong)))
    // and the estimate is in the right neighborhood of truth (|∩| = 301,
    // |A| = 500): a k = 16 sketch is coarse but not wild
    assert(got._3 > 200000L && got._3 < 1000000L)
  }

  test("a missing target day yields no row; offsets clip at the horizon") {
    val days = Seq(0L -> (1 to 50), 3L -> (1 to 50))
    val got = run(days, k = 64, maxOffset = 6)
    assert(got.keySet == Set((0L, 0L), (0L, 3L), (3L, 0L)),
      "only existing (day, day+d) pairs report")
    assert(got((0L, 3L))._3 == 1000000L)
  }

  private def hash48Of(v: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.toString.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }
}
