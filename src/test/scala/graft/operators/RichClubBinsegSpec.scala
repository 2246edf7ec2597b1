package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RichClubBinsegSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("richClub: a clique of hubs scores phi = 10^6; tiny clubs are NULL") {
    // triangle {1,2,3} (deg ≥ 2) plus pendant 4–1 (deg 4 = 1, deg 1 = 3)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val got = Graph.richClub(edges.toDF("src", "dst"), Seq(1L, 2L))
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 3L, Some(1000000L))))
    assert(got(2L) == ((1L, 0L, None)))
  }

  test("richClub: a star has NO club — hubs need peers") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val got = Graph.richClub(star.toDF("src", "dst"), Seq(1L))
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(got == ((1L, 1L, 0L, None)))
  }

  private def seg(rows: Seq[(String, Long, Long)]) =
    Changepoint.binarySegment(rows.toDF("k", "p", "x"),
        col("k"), col("p"), col("x"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("binarySegment finds a level shift at its exact boundary") {
    val rows = (1L to 3L).map(p => ("a", p, 0L)) ++
      (4L to 5L).map(p => ("a", p, 10L))
    // S = 20, n = 5; scores |sb·n − S·b|: b1 20, b2 40, b3 60, b4 30 →
    // split after pos 3 with exact segment means 0 and 10
    assert(seg(rows)("a") == ((5L, 3L, 60L, 0L, 10000L)))
  }

  test("binarySegment breaks score ties on the smaller position") {
    val rows = Seq(("a", 1L, 5L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 5L))
    val (n, split, score, _, _) = seg(rows)("a")
    assert(n == 4L && split == 1L && score == 10L)
  }

  test("binarySegment drops single-point series (no interior split)") {
    val rows = Seq(("a", 1L, 7L), ("b", 1L, 1L), ("b", 2L, 9L))
    val got = seg(rows)
    assert(!got.contains("a") && got("b") == ((2L, 1L, 8L, 1000L, 9000L)))
  }
}
