package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SequencesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (user, seq, type, ts_sec)
  private val fixture = Seq(
    // u1: A B C A B C — two ABC occurrences plus BCA, CAB in between
    (1L, 1L, "A", 100L), (1L, 2L, "B", 200L), (1L, 3L, "C", 300L),
    (1L, 4L, "A", 400L), (1L, 5L, "B", 500L), (1L, 6L, "C", 600L),
    // u2: A B [gap>30min] C — the gap kills ABC, and also BC? no: B→C gap
    (2L, 1L, "A", 100L), (2L, 2L, "B", 200L), (2L, 3L, "C", 5000L),
    // u3: A B C with the FIRST gap broken
    (3L, 1L, "A", 100L), (3L, 2L, "B", 4000L), (3L, 3L, "C", 4100L),
    // u4: only two events — no triple
    (4L, 1L, "A", 100L), (4L, 2L, "B", 200L)
  ).toDF("u", "seq", "et", "ts_sec")

  private def run() =
    Sequences.contiguousTriples(fixture, "u", "et", "seq", "ts_sec", 1800L)
      .as[(String, String, String, Long, Long)]
      .collect().map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap

  test("contiguous triples count occurrences and distinct-user support") {
    val got = run()
    assert(got(("A", "B", "C")) == ((2L, 1L)), "ABC occurs twice, one user")
    assert(got(("B", "C", "A")) == ((1L, 1L)))
    assert(got(("C", "A", "B")) == ((1L, 1L)))
    assert(got.size == 3, s"gap-broken or short sequences must not pattern: $got")
  }

  test("a gap over the limit breaks the pattern at that step only") {
    // u2's A→B is within the gap but B→C is not; u3's A→B is broken.
    // Neither contributes any triple — asserted via the total counts above —
    // but shrinking the gap limit to 50 must ALSO kill u1's patterns.
    val tight = Sequences.contiguousTriples(fixture, "u", "et", "seq",
      "ts_sec", 50L)
    assert(tight.count() == 0)
  }

  test("ordering column, not timestamp, defines adjacency") {
    // Same events, but seq order reversed for u1 ⇒ different triples.
    val rev = fixture.filter($"u" === 1L)
      .withColumn("seq", org.apache.spark.sql.functions.expr("7 - seq"))
    val got = Sequences.contiguousTriples(rev, "u", "et", "seq", "ts_sec", 1800L)
      .as[(String, String, String, Long, Long)].collect()
    // reversed order: C B A C B A with DESCENDING ts — every gap is
    // negative, trivially <= limit, so CBA/BAC/ACB each once... except
    // gaps: ts diffs are negative (earlier events later in order), which
    // the operator treats as within-gap (<=). Patterns flip to CBA etc.
    val keys = got.map(r => (r._1, r._2, r._3)).toSet
    assert(keys == Set(("C", "B", "A"), ("B", "A", "C"), ("A", "C", "B")))
  }
}
