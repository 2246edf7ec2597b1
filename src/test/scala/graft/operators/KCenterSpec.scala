package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class KCenterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    Graph.kCenterGreedy(edges.toDF("src", "dst"), k, rounds)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._2)

  test("a path picks its ends first, then the uncovered middle") {
    // path 1..5: start at 1; farthest within 2 hops... 4,5 are beyond →
    // dist 3 (rounds+1), tie → 4; then 5 has dist 1 to 4, middle 3 is
    // covered at 1 — all ≤1, farthest ties at dist 1 → smallest id 2
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = run(path, 3, 2)
    assert(got == Seq((1L, 1L, 0L), (4L, 2L, 3L), (2L, 3L, 1L)))
  }

  test("two far cliques: the second pick jumps to the other clique") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L))
    val got = run(e, 2, 2)
    assert(got.head == ((1L, 1L, 0L)))
    // every node in the far clique is unreachable (dist 3); tie → 10
    assert(got(1) == ((10L, 2L, 3L)))
  }

  test("k=1 returns only the deterministic first pick") {
    assert(run(Seq((5L, 7L)), 1, 2) == Seq((5L, 1L, 0L)))
  }
}
