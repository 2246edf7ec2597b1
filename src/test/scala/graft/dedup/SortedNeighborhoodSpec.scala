package graft.dedup

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** D15: sorted-neighborhood (SNM) dedup candidates. */
class SortedNeighborhoodSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], window: Int,
                    minPpm: Long = 0L): Seq[(Long, Long, Long)] =
    Dedup.sortedNeighborhoodPairs(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), window, nGram = 3, minPpm = minPpm)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq

  test("window pairs follow SORT order, not id order") {
    // sort keys: "aaa…" (id 3), "aab…" (id 1), "zzz…" (id 2): window 2
    // pairs 3-1 (adjacent) and 1-2 (adjacent), never 3-2
    val docs = Seq(3L -> "aaa common tail here", 1L -> "aab common tail here",
      2L -> "zzz different entirely")
    val got = pairs(docs, window = 2)
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L), (3L, 1L)))
  }

  test("rank is globally consecutive across first-byte bucket boundaries") {
    // keys "az…" and "ba…" land in DIFFERENT first-byte buckets but are
    // rank-adjacent — a per-bucket-only rank would miss this pair
    val docs = Seq(10L -> "az shared suffix text", 20L -> "ba shared suffix text",
      30L -> "mm far away in the middle")
    val got = pairs(docs, window = 2)
    assert(got.map(p => (p._1, p._2)).contains((20L, 30L)) ||
      got.map(p => (p._1, p._2)).contains((10L, 30L)) ||
      got.map(p => (p._1, p._2)).contains((30L, 20L)),
      s"bucket-boundary neighbors must pair; got $got")
    assert(got.size == 2, "window 2 on 3 docs -> exactly 2 adjacent pairs")
  }

  test("jaccard ppm is exact integer arithmetic") {
    // identical texts -> 1e6; disjoint alphabets -> 0 (filtered at 1)
    val docs = Seq(1L -> "abcdef", 2L -> "abcdef")
    val got = pairs(docs, window = 2)
    assert(got == Seq((1L, 2L, 1000000L)))
    assert(pairs(Seq(1L -> "aaaa", 2L -> "zzzz"), 2, minPpm = 1L).isEmpty)
  }

  test("threshold filters below-minPpm pairs") {
    val docs = Seq(1L -> "the quick brown fox jumps",
      2L -> "the quick brown fox jumped", 3L -> "unrelated zebra stripes")
    val strict = pairs(docs, window = 3, minPpm = 700000L)
    assert(strict.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      "only the near-identical pair clears 0.7")
  }
}
