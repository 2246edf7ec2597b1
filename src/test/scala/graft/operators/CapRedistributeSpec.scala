package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** T25: cap-and-redistribute mixture weights. */
class CapRedistributeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def solve(masses: Seq[(String, Long)], capPpm: Long,
                    iters: Int = 5): Map[String, (Long, Boolean)] =
    Sampling.capRedistribute(masses.toDF("source", "n_tokens"),
        col("source"), col("n_tokens"), capPpm, iters)
      .select("source", "w_ppm", "capped")
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("no source over the cap: plain proportional shares") {
    val got = solve(Seq("a" -> 100L, "b" -> 300L), capPpm = 900000L)
    assert(got == Map("a" -> ((250000L, false)), "b" -> ((750000L, false))))
  }

  test("one dominant source pins at the cap, excess flows to the rest") {
    // natural: a=80%, b=c=10%; cap 50% -> a pinned, b and c split the
    // remaining 500000 equally
    val got = solve(Seq("a" -> 800L, "b" -> 100L, "c" -> 100L),
      capPpm = 500000L)
    assert(got("a") == ((500000L, true)))
    assert(got("b") == ((250000L, false)) && got("c") == ((250000L, false)))
  }

  test("redistribution cascades: a newly-over-cap source caps next round") {
    // natural ppm: a=600000, b=266666, c=133333; cap 350000:
    // round 1 caps a (b gets 433333 -> over); round 2 caps b; round 3
    // gives c the full remainder 300000, under the cap — three distinct
    // rounds, which is why `iterations` exists
    val got = solve(Seq("a" -> 450L, "b" -> 200L, "c" -> 100L),
      capPpm = 350000L)
    assert(got("a") == ((350000L, true)) && got("b") == ((350000L, true)))
    assert(got("c") == ((300000L, false)))
  }

  test("weights sum to 1e6 up to floor truncation, never above") {
    val got = solve(Seq("a" -> 7L, "b" -> 11L, "c" -> 13L), capPpm = 400000L)
    val s = got.values.map(_._1).sum
    assert(s <= 1000000L && s >= 999990L, s"sum $s")
  }

  test("all sources capped leaves budget undistributed (policy floor)") {
    val got = solve(Seq("a" -> 10L, "b" -> 10L), capPpm = 100000L)
    assert(got.values.forall(_ == ((100000L, true))))
  }

  test("T26: isqrt is exact, including perfect squares and off-by-one traps") {
    val xs = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L, 24L, 25L,
      999999L, 1000000L, 1000001L, 4503599627370495L)
    val got = xs.toDF("x")
      .select(col("x"), Sampling.isqrt(col("x")).as("s"))
      .as[(Long, Long)].collect().toMap
    xs.foreach { x =>
      val s = got(x)
      assert(s * s <= x && (s + 1) * (s + 1) > x, s"isqrt($x) = $s")
    }
  }

  test("T26: sqrt temperature lifts low-resource shares vs proportional") {
    // masses 100 vs 10000: proportional 1%:99%; sqrt -> 10:100 ≈ 9%:90%
    val got = Sampling.temperatureWeights(
        Seq(("lo", 100L), ("hi", 10000L)).toDF("source", "n_tokens"),
        col("source"), col("n_tokens"))
      .select("source", "w_ppm").as[(String, Long)].collect().toMap
    assert(got("lo") == 90909L && got("hi") == 909090L)
  }
}
