package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SquaresConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def squares(edges: Seq[(Long, Long)]) =
    Graph.squareCount(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Long)].collect().head

  test("a plain 4-cycle is one square; a triangle is none") {
    assert(squares(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
      == ((4L, 4L, 2L, 1L)))
    assert(squares(Seq((1L, 2L), (2L, 3L), (3L, 1L)))._4 == 0L)
  }

  test("K4 holds three squares (each diagonal pairing)") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(squares(k4)._4 == 3L)
  }

  test("K23 holds three squares (choose 2 of 3 right nodes)") {
    val k23 = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (2L, 12L))
    // co-paired: the 3 right-node pairs (c=2 via the two left hubs) plus
    // the left pair (c=3 via the three right nodes)
    assert(squares(k23) == ((5L, 6L, 4L, 3L)))
  }

  private def peak(rows: Seq[(String, Long, Long)]) =
    Intervals.peakConcurrency(rows.toDF("g", "s", "e"),
        col("g"), col("s"), col("e"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("peakConcurrency counts overlaps and reports the earliest peak") {
    // [0,10) [5,15) [8,12): all three open in [8,10) → peak 3 at t=8
    val rows = Seq(("a", 0L, 10L), ("a", 5L, 15L), ("a", 8L, 12L))
    assert(peak(rows)("a") == ((3L, 3L, 8L)))
  }

  test("half-open handoff at the same instant never double-counts") {
    // [0,5) then [5,10): the end's −1 sorts before the start's +1 at t=5
    val rows = Seq(("a", 0L, 5L), ("a", 5L, 10L))
    assert(peak(rows)("a") == ((2L, 1L, 0L)))
  }

  test("groups are independent") {
    val rows = Seq(("a", 0L, 5L), ("b", 0L, 5L), ("b", 1L, 4L))
    val got = peak(rows)
    assert(got("a")._2 == 1L && got("b") == ((2L, 2L, 1L)))
  }
}
