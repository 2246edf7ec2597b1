package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): (Long, Long, Long) =
    Graph.triangleCount(edges.toDF("src", "dst"))
      .as[(Long, Long, Long)].collect().head

  test("counts the triangles of known graphs") {
    // K4 has C(4,3) = 4 triangles
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(count(k4) == ((4L, 6L, 4L)))
    // a 4-cycle has none
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == ((4L, 4L, 0L)))
    // two triangles sharing an edge
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)))
      == ((4L, 5L, 2L)))
  }

  test("canonicalizes duplicates, reversed edges, and self-loops") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(count(messy) == ((3L, 3L, 1L)))
  }

  test("a star (hub of high degree) has no triangles and no wedge blowup") {
    val star = (2L to 40L).map(i => (1L, i))
    assert(count(star) == ((40L, 39L, 0L)))
  }

  test("empty edge set yields a zero report, not an empty frame") {
    val (n, m, t) = count(Seq.empty)
    assert(n == 0L && m == 0L && t == 0L)
  }

  // OnDir entry points: feeding the ALREADY canonical doubled table must
  // reproduce the raw-edge path bit-for-bit (the staged-graph contract
  // the r9 gate re-pointing relies on)
  test("OnDir variants match the raw-edge path on a messy fixture") {
    import org.apache.spark.sql.functions.col
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L), (3L, 4L), (4L, 5L), (5L, 3L), (6L, 1L)).toDF("src", "dst")
    // canonical doubled table built the way QueriesR6.coPurchaseDir does
    val und = messy.selectExpr("least(src, dst) AS src", "greatest(src, dst) AS dst")
      .filter(col("src") =!= col("dst")).distinct()
    val dir = und.unionAll(und.select(col("dst").as("src"), col("src").as("dst")))
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    assert(rows(Graph.pageRankOnDir(dir, 3)) == rows(Graph.pageRank(messy, 3)))
    assert(rows(Graph.labelPropagationOnDir(dir, 3)) ==
      rows(Graph.labelPropagation(messy, 3)))
    assert(rows(Graph.eigenvectorCentralityOnDir(dir, 3)) ==
      rows(Graph.eigenvectorCentrality(messy, 3)))
    val seeds = Seq(1L, 4L).toDF("node")
    assert(rows(Graph.personalizedPageRankOnDir(dir, seeds, 3)) ==
      rows(Graph.personalizedPageRank(messy, seeds, 3)))
  }
}
