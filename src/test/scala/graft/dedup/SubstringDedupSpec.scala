package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** D14: exact substring-overlap dedup. */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def overlap(docs: Seq[(Long, String)], w: Int, minShared: Int,
                      hotCap: Int): Map[(Long, Long), (Long, Long)] =
    Dedup.substringOverlap(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), w, minShared, hotCap)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("a planted shared run is found with its exact token length") {
    // docs 1 and 2 share the 6-token run "p q r s t u" exactly once
    val docs = Seq(
      1L -> "a b c p q r s t u d e f",
      2L -> "x y p q r s t u z w v k",
      3L -> "completely different words here nothing shared at all")
    // w=4: shared windows = the 3 sliding windows inside the 6-token run
    val got = overlap(docs, w = 4, minShared = 2, hotCap = 10)
    assert(got == Map((1L, 2L) -> ((3L, 6L))),
      "3 shared 4-windows, longest run 3 -> 4 + 3 - 1 = 6 tokens")
  }

  test("two disjoint shared runs report the longer one") {
    val docs = Seq(
      1L -> "m1 m2 m3 m4 GAP1 n1 n2 n3 n4 n5 n6 end1",
      2L -> "m1 m2 m3 m4 GAP2 other n1 n2 n3 n4 n5 n6")
    val got = overlap(docs, w = 3, minShared = 1, hotCap = 10)
    // runs: "m1..m4" = 2 windows; "n1..n6" = 4 windows -> longest 3+4-1=6
    assert(got((1L, 2L)) == ((6L, 6L)))
  }

  test("hot boilerplate windows generate no pairs") {
    // every doc shares the same 4-token boilerplate; cap 3 drops it
    val docs = (1L to 5L).map(i => i -> s"BP1 BP2 BP3 BP4 unique$i tail$i")
    assert(overlap(docs, w = 4, minShared = 1, hotCap = 3).isEmpty)
    // raising the cap reveals the C(5,2) boilerplate pairs
    assert(overlap(docs, w = 4, minShared = 1, hotCap = 5).size == 10)
  }

  test("docs shorter than the window are ignored, threshold filters") {
    val docs = Seq(1L -> "a b", 2L -> "a b", 3L -> "a b c d e a b c d e x y")
    assert(overlap(docs, w = 4, minShared = 1, hotCap = 10).isEmpty)
    // minShared above the actual count filters the pair out
    val one = Seq(1L -> "s1 s2 s3 s4 t1", 2L -> "s1 s2 s3 s4 t2")
    assert(overlap(one, w = 4, minShared = 2, hotCap = 10).isEmpty)
    assert(overlap(one, w = 4, minShared = 1, hotCap = 10)
      == Map((1L, 2L) -> ((1L, 4L))))
  }

  test("repeated windows dedup to first occurrence") {
    // the window "r1 r2 r3" appears twice in doc 1; counted once, and the
    // run is measured at the FIRST occurrence
    val docs = Seq(
      1L -> "r1 r2 r3 x r1 r2 r3 y z",
      2L -> "k r1 r2 r3 m n o p q")
    val got = overlap(docs, w = 3, minShared = 1, hotCap = 10)
    assert(got == Map((1L, 2L) -> ((1L, 3L))))
  }
}
