package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The delta-maintenance law of the band-ownership index: merging a
  * persisted index with a delta's index equals the index built from
  * scratch, and with monotone ingest ids the incremental keep set equals
  * the full-batch owns-all-bands rule.
  */
class DedupIncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // near-dup pairs within each (base, base+1) id pair; unique otherwise
  private def corpus(ids: Seq[Long]) = ids.map { i =>
    val stem = if (i % 10 == 1) i - 1 else i // 10k+1 duplicates 10k
    (i, s"alpha beta gamma delta epsilon zeta $stem eta theta iota kappa")
  }.toDF("doc_id", "text")

  private def bands(df: org.apache.spark.sql.DataFrame) =
    Dedup.minhashBandRows(df, col("doc_id"), col("text"),
      shingleWords = 3, k = 12, bands = 4)

  test("merged owner index == from-scratch index") {
    val all = corpus(1L to 40L)
    val a = all.filter(col("doc_id") <= 20)
    val b = all.filter(col("doc_id") > 20)
    val merged = Dedup.mergeBandOwners(
        Dedup.bandOwners(bands(a)), Dedup.bandOwners(bands(b)))
      .as[(String, Long)].collect().toMap
    val scratch = Dedup.bandOwners(bands(all))
      .as[(String, Long)].collect().toMap
    assert(merged == scratch)
  }

  test("incremental keep set == full-batch rule under monotone ids") {
    val all = corpus(1L to 40L)
    val a = all.filter(col("doc_id") <= 20)
    val b = all.filter(col("doc_id") > 20)
    val ownersA = Dedup.bandOwners(bands(a)).localCheckpoint(true)
    val keptA = Dedup.nearDupKeepSet(a.select(col("doc_id")), bands(a), ownersA)
    val merged = Dedup.mergeBandOwners(ownersA, Dedup.bandOwners(bands(b)))
    val keptB = Dedup.nearDupKeepSet(b.select(col("doc_id")), bands(b), merged)
    val incremental = keptA.unionByName(keptB).as[Long].collect().toSet
    val full = Dedup.nearDupKeepSet(all.select(col("doc_id")), bands(all),
      Dedup.bandOwners(bands(all))).as[Long].collect().toSet
    assert(incremental == full)
    // the fixture has real duplicates, so the rule actually dropped some
    assert(incremental.size < 40)
    // every x1-id whose x0 stem-twin exists is the dropped one, never the keeper
    assert(Seq(11L, 21L, 31L).forall(i => !incremental.contains(i)))
  }

  test("a delta CAN steal ownership when its ids are smaller (documented edge)") {
    // id 100 arrives first, its twin 0 arrives 'later' with a smaller id:
    // min-ownership reassigns the band and 100 is no longer kept. This is
    // why the incremental contract requires monotone ingest ids.
    val first = corpus(Seq(100L))
    val later = Seq((0L,
      "alpha beta gamma delta epsilon zeta 100 eta theta iota kappa"))
      .toDF("doc_id", "text")
    val merged = Dedup.mergeBandOwners(
      Dedup.bandOwners(bands(first)), Dedup.bandOwners(bands(later)))
    val keptFirst = Dedup.nearDupKeepSet(first.select(col("doc_id")),
      bands(first), merged).as[Long].collect().toSet
    assert(keptFirst.isEmpty, "the earlier doc lost every band to id 0")
  }

  test("docs too short to shingle are trivially kept") {
    val mix = Seq((1L, "tiny"), (2L, "also small")).toDF("doc_id", "text")
    val kept = Dedup.nearDupKeepSet(mix.select(col("doc_id")), bands(mix),
      Dedup.bandOwners(bands(mix))).as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }
}
