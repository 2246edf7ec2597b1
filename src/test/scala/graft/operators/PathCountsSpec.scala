package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** R105: shortest-path counting (σ) from a seed set. */
class PathCountsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  rounds: Int = 10): Map[(Long, Long), (Long, Long)] =
    Graph.shortestPathCounts(edges.toDF("src", "dst"),
        seeds.toDF("node"), rounds)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("diamond: two equal-length routes double sigma") {
    // 1-2-4 and 1-3-4: dist(4)=2 via two paths
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val got = run(g, Seq(1L))
    assert(got((1L, 4L)) == ((2L, 2L)))
    assert(got((1L, 2L)) == ((1L, 1L)) && got((1L, 3L)) == ((1L, 1L)))
  }

  test("sigma multiplies along chained diamonds") {
    // two diamonds in series: 4 shortest paths to the far end
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 7L), (6L, 7L))
    assert(run(g, Seq(1L))((1L, 7L)) == ((4L, 4L)))
  }

  test("a shortcut kills the longer route's contribution") {
    // 1-4 direct edge: dist(4)=1 with sigma 1, NOT 3
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 4L))
    assert(run(g, Seq(1L))((1L, 4L)) == ((1L, 1L)))
  }

  test("multi-seed: each seed counts independently") {
    val g = Seq((1L, 2L), (2L, 3L))
    val got = run(g, Seq(1L, 3L))
    assert(got((1L, 3L)) == ((2L, 1L)) && got((3L, 1L)) == ((2L, 1L)))
    assert(got((1L, 1L)) == ((0L, 1L)) && got((3L, 3L)) == ((0L, 1L)))
  }

  test("fixed rounds truncate the frontier") {
    val path = (1L to 5L).map(i => (i, i + 1))
    val got = run(path, Seq(1L), rounds = 2)
    assert(got.keySet.map(_._2) == Set(1L, 2L, 3L))
  }

  test("R106 derivation: harmonic x60 and eccentricity are exact") {
    import org.apache.spark.sql.functions._
    // star on 1..5 (center 1): center ecc 1, harmonic 4*60;
    // leaf 2: center at 1, three leaves at 2 -> 60 + 3*30, ecc 2
    val star = (2L to 5L).map(i => (1L, i))
    val got = Graph.shortestPathCounts(star.toDF("src", "dst"),
        Seq(1L, 2L).toDF("node"), rounds = 6)
      .filter(col("dist") > 0)
      .groupBy(col("seed"))
      .agg(max(col("dist")).as("ecc"),
        sum(expr("60 div dist")).as("h60"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((1L, 240L)))
    assert(got(2L) == ((2L, 150L)))
  }
}
