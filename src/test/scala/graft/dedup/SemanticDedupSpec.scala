package graft.dedup

import graft.{QueriesR17, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D22 semantic dedup — the SCALE contract the r8 verdict flagged:
  * cluster population is bounded in code before pair generation, so the
  * within-cluster all-pairs join can never go quadratic at a fixed k.
  */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("pair volume is bounded by cap * n (the band-split contract)") {
    val (_, members) = QueriesR17.semMembers(spark, sf)
    val n = members.count()
    val pairVolume = members.groupBy(col("cluster_id"), col("blk"))
      .agg(count(lit(1)).as("sz"))
      .agg(sum(expr("sz * (sz - 1) div 2")))
      .head.getLong(0)
    assert(pairVolume <= QueriesR17.SemCap * n,
      s"pair volume $pairVolume exceeds cap*n = ${QueriesR17.SemCap * n}")
  }

  test("no block exceeds 4x the cap on the gate fixture") {
    // the split is expectation-bounded (hash blocking), so assert a
    // generous multiple rather than the exact cap — a block past 4x cap
    // would mean the ladder or the band computation regressed
    val (_, members) = QueriesR17.semMembers(spark, sf)
    val maxBlock = members.groupBy(col("cluster_id"), col("blk"))
      .agg(count(lit(1)).as("sz")).agg(max(col("sz"))).head.getLong(0)
    assert(maxBlock <= 4 * QueriesR17.SemCap,
      s"largest block $maxBlock exceeds 4x cap ${4 * QueriesR17.SemCap}")
  }

  test("identical vectors land in the same block and dedup to one keeper") {
    // identical embeddings share every SimHash sign bit by construction,
    // so the band split can never separate true duplicates
    import spark.implicits._
    val out = QueriesR17.queries("dedup_semantic")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    // the fixture has real near-dup groups (r8: 17 drops at sf0.01,
    // embeddings identical at sf0.001); re-check drops exist and every
    // group's keeper is its minimum member id
    val drops = out.count(_._4 == 0L)
    assert(drops > 0, "gate fixture lost its near-dup groups")
    val byRep = out.groupBy(_._3)
    byRep.foreach { case (rep, rows) =>
      assert(rows.map(_._1).min == rep,
        s"group $rep keeper is not the minimum member id")
      assert(rows.count(_._4 == 1L) == 1 || rows.forall(_._1 != rep),
        s"group $rep does not have exactly one keeper")
    }
  }

  test("every vector appears exactly once with a self-or-group rep") {
    import spark.implicits._
    val out = QueriesR17.queries("dedup_semantic")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.forall(r => r._4 == (if (r._1 == r._3) 1L else 0L)))
  }
}
