package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The iterative graph operators hint their node-sized per-round tables
  * for broadcast only below "spark.graft.broadcastMaxRows". These tests
  * run the same graphs with the gate forced shut (threshold 0 → every
  * round joins by shuffle) and assert bit-identical results — the
  * 10⁹-node fallback path is not a different algorithm.
  */
class BroadcastGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val edges = (
    // two triangles bridged by a path, plus a pendant chain
    Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (4L, 6L), (6L, 7L), (7L, 8L), (8L, 9L))
  ).toDF("src", "dst")

  private def withGate[A](maxRows: String)(body: => A): A = {
    spark.conf.set("spark.graft.broadcastMaxRows", maxRows)
    try body finally spark.conf.unset("spark.graft.broadcastMaxRows")
  }

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(df.columns.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq

  test("kCore: gated-shut shuffle path equals the broadcast path") {
    val hinted = sorted(Graph.kCore(edges, 2, 10))
    val shuffled = withGate("0")(sorted(Graph.kCore(edges, 2, 10)))
    assert(hinted == shuffled && hinted.nonEmpty)
  }

  test("bfsHops: gated-shut shuffle path equals the broadcast path") {
    val seeds = Seq(1L).toDF("node")
    val hinted = sorted(Graph.bfsHops(edges, seeds, 8))
    val shuffled = withGate("0")(sorted(Graph.bfsHops(edges, seeds, 8)))
    assert(hinted == shuffled && hinted.size == 9)
  }

  test("pageRank: gated-shut shuffle path equals the broadcast path") {
    val hinted = sorted(Graph.pageRank(edges, 3))
    val shuffled = withGate("0")(sorted(Graph.pageRank(edges, 3)))
    assert(hinted == shuffled && hinted.nonEmpty)
  }

  test("labelPropagation: gated-shut shuffle path equals the broadcast path") {
    val hinted = sorted(Graph.labelPropagation(edges, 3))
    val shuffled = withGate("0")(sorted(Graph.labelPropagation(edges, 3)))
    assert(hinted == shuffled && hinted.nonEmpty)
  }

  test("shortestPathsWeighted: gated-shut path equals the broadcast path") {
    val w = edges.withColumn("w", org.apache.spark.sql.functions.expr(
      "src + dst"))
    val seeds = Seq(1L).toDF("node")
    val hinted = sorted(Graph.shortestPathsWeighted(w, seeds, 8))
    val shuffled = withGate("0")(sorted(Graph.shortestPathsWeighted(w, seeds, 8)))
    assert(hinted == shuffled && hinted.nonEmpty)
  }
}
