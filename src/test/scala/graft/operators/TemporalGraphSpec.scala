package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TemporalGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                  rounds: Int): Map[(Long, Long), Long] =
    TemporalGraph.earliestArrival(edges.toDF("src", "dst", "t"),
        seeds.toDF("node"), rounds)
      .as[(Long, Long, Long)].collect()
      .map { case (s, n, a) => (s, n) -> a }.toMap

  test("time order gates reachability: stale edges cannot carry flow") {
    // 1 →(t=5)→ 2 →(t=3)→ 3: the 2→3 edge fires BEFORE arrival at 2,
    // so 3 is unreachable from 1; from seed 2 it is reachable at t=3
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 3L))
    val got = run(edges, Seq(1L, 2L), 3)
    assert(got == Map(
      (1L, 1L) -> 0L, (1L, 2L) -> 5L,
      (2L, 2L) -> 0L, (2L, 3L) -> 3L))
  }

  test("waiting is allowed: equal timestamps chain (non-strict)") {
    val edges = Seq((1L, 2L, 4L), (2L, 3L, 4L))
    val got = run(edges, Seq(1L), 2)
    assert(got((1L, 3L)) == 4L)
  }

  test("earliest arrival wins over a faster-found later path") {
    // direct 1→3 at t=9; two-hop 1→2 (t=1) →3 (t=2) arrives earlier
    val edges = Seq((1L, 3L, 9L), (1L, 2L, 1L), (2L, 3L, 2L))
    assert(run(edges, Seq(1L), 1)((1L, 3L)) == 9L)  // one hop: direct only
    assert(run(edges, Seq(1L), 2)((1L, 3L)) == 2L)  // two hops: improved
  }

  test("the hop budget bounds the frontier") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L))
    val got = run(edges, Seq(1L), 2)
    assert(got.contains((1L, 3L)) && !got.contains((1L, 4L)))
  }

  private def runLatest(edges: Seq[(Long, Long, Long)], targets: Seq[Long],
                        rounds: Int, horizon: Long): Map[(Long, Long), Long] =
    TemporalGraph.latestDeparture(edges.toDF("src", "dst", "t"),
        targets.toDF("node"), rounds, horizon)
      .as[(Long, Long, Long)].collect()
      .map { case (tg, n, d) => (tg, n) -> d }.toMap

  test("latestDeparture is gated by downstream edge times") {
    // 1 →(t=5)→ 2 →(t=3)→ 3: to reach 3, node 1 must use the t=5 edge,
    // but 2→3 fires at 3 < 5 — unreachable; node 2 departs at 3
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 3L))
    val got = runLatest(edges, Seq(3L), 3, horizon = 100L)
    assert(got == Map((3L, 3L) -> 100L, (3L, 2L) -> 3L))
  }

  test("latestDeparture picks the LATEST viable start among paths") {
    // 1 can reach 3 via t=2→t=4 chain (depart 2) or directly at t=1:
    // latest viable departure is 2
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 4L), (1L, 3L, 1L))
    val got = runLatest(edges, Seq(3L), 2, horizon = 100L)
    assert(got((3L, 1L)) == 2L)
  }

  private def runFastest(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                         rounds: Int): Map[(Long, Long), Long] =
    TemporalGraph.fastestJourney(edges.toDF("src", "dst", "t"),
        seeds.toDF("node"), rounds)
      .as[(Long, Long, Long)].collect()
      .map { case (s, n, d) => (s, n) -> d }.toMap

  test("fastestJourney minimizes transit, not arrival") {
    // to 3: depart 0, hop t=0 → t=9 (dur 9) OR depart 8, hop t=8 → t=9
    // (dur 1): earliest ARRIVAL ties at 9, fastest journey is 1
    val edges = Seq((1L, 2L, 0L), (2L, 3L, 9L), (1L, 2L, 8L))
    val got = runFastest(edges, Seq(1L), 2)
    assert(got((1L, 3L)) == 1L)
    assert(got((1L, 2L)) == 0L)   // direct hop arrives as it departs
    assert(got((1L, 1L)) == 0L)   // seed transit is zero
  }

  test("fastestJourney respects time order along the journey") {
    // the late cheap start 1→2@t=5 cannot use the earlier 2→3@t=3 edge
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 3L), (1L, 2L, 0L))
    val got = runFastest(edges, Seq(1L), 2)
    assert(got((1L, 3L)) == 3L)   // only via the t=0 start, arr 3
  }
}
