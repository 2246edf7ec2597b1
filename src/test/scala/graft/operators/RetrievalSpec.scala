package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4 docs, N=4; vocab {a, b}; c is noise.
  // dl: d1=4, d2=2, d3=3, d4=3; L=12
  private val docs = Seq(
    (1L, "a a b c"),   // tf(a)=2, tf(b)=1
    (2L, "a c"),       // tf(a)=1
    (3L, "c c c"),     // no hits
    (4L, "b b b")      // tf(b)=3
  ).toDF("doc_id", "text")

  private def run(topN: Int = 10) =
    Retrieval.bm25(docs, "doc_id", "text", Seq("a", "b"), topN)
      .as[(Long, Long, Long, Long)].collect().toSeq

  /** The documented fixed-point formula, in plain Scala. */
  private def termScore(tf: Long, df: Long, dl: Long, n: Long, l: Long): Long = {
    val idfPpm = (2 * (n - df) + 1) * 1000000L / (2 * df + 1)
    val num = BigInt(idfPpm) * 44 * tf * l
    val den = BigInt(20 * tf * l + 6 * l + 18 * dl * n)
    (num / den).toLong
  }

  test("scores match the hand-evaluated fixed-point formula") {
    val (n, l) = (4L, 12L)
    val dfA = 2L; val dfB = 2L
    val expected = Map(
      1L -> (termScore(2, dfA, 4, n, l) + termScore(1, dfB, 4, n, l)),
      2L -> termScore(1, dfA, 2, n, l),
      4L -> termScore(3, dfB, 3, n, l))
    val got = run().map(r => r._2 -> r._4).toMap
    assert(got == expected)
    assert(!got.contains(3L), "doc without any probe term must not appear")
  }

  test("ranking is (score desc, doc_id asc) with dense 1-based ranks") {
    val got = run()
    assert(got.map(_._1) == (1L to got.size))
    val resorted = got.sortBy(r => (-r._4, r._2))
    assert(got == resorted)
  }

  test("topN truncates after ordering") {
    val got = run(topN = 2)
    assert(got.size == 2)
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got.map(_._4) == run().take(2).map(_._4))
  }

  test("higher term frequency beats lower at equal df and dl") {
    // d4 (tf_b=3, dl=3) must outscore d2 (tf_a=1, dl=2): saturation grows
    // with tf, and idf is equal since df(a)=df(b).
    val byDoc = run().map(r => r._2 -> r._4).toMap
    assert(byDoc(4L) > byDoc(2L))
  }

  test("empty vocabulary is rejected loudly") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25(docs, "doc_id", "text", Nil, 10)
    }
  }

  // ---------------------------------------------------- phraseProximity

  private val proxDocs = Seq(
    (1L, "x window scan y"),          // exact phrase, dist 1
    (2L, "scan q q window"),          // reversed, 3 apart: no phrase
    (3L, "window scan window scan"),  // two phrase hits
    (4L, "window only here"),         // missing 'scan': excluded
    (5L, "nothing relevant"),
    (6L, "windows scanner window q scan") // substrings must not match
  ).toDF("doc_id", "text")

  private def prox(topN: Int = 10) =
    Retrieval.phraseProximity(proxDocs, "doc_id", "text", "window", "scan", topN)
      .as[(Long, Long, Long)].collect().toSeq

  test("phrase hits and min distance are exact, token-level, both-terms-only") {
    val byDoc = prox().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byDoc(1L) == ((1L, 1L)))
    assert(byDoc(2L) == ((0L, 3L)), "reversed order scores distance but no phrase")
    assert(byDoc(3L) == ((2L, 1L)))
    assert(byDoc(6L) == ((0L, 2L)),
      "'windows'/'scanner' are prefilter noise, not token matches: pos 3 vs 5")
    assert(!byDoc.contains(4L) && !byDoc.contains(5L))
  }

  test("ranking is (n_phrase desc, min_dist asc, doc_id) and topN truncates") {
    assert(prox().map(_._1) == Seq(3L, 1L, 6L, 2L))
    assert(prox(topN = 2).map(_._1) == Seq(3L, 1L))
  }

  test("identical phrase terms are rejected loudly") {
    intercept[IllegalArgumentException] {
      Retrieval.phraseProximity(proxDocs, "doc_id", "text", "scan", "scan", 10)
    }
  }

  // ----------------------------------------- T29/T30 corpus statistics

  test("good-turing: hand spectrum with the tail NULL") {
    val corpus = Seq(Tuple1("a a a b b c")).toDF("text")
    val toks = org.apache.spark.sql.functions.split(
      org.apache.spark.sql.functions.col("text"), " ")
    val got = Retrieval.goodTuring(corpus, toks)
      .as[(Long, Long, Option[Long], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // freqs a:3 b:2 c:1 -> N1=N2=N3=1, total 6
    assert(got(1L) == ((1L, Some(2000000L), 166666L)))
    assert(got(2L) == ((1L, Some(3000000L), 333333L)))
    assert(got(3L) == ((1L, None, 500000L)), "no N4: tail r* is NULL")
  }

  test("zipf: rank-frequency products with exact ratios to the top") {
    val corpus = Seq(Tuple1("a a a b b c")).toDF("text")
    val toks = org.apache.spark.sql.functions.split(
      org.apache.spark.sql.functions.col("text"), " ")
    val got = Retrieval.zipfReport(corpus, toks, topN = 2)
      .orderBy(org.apache.spark.sql.functions.col("rank"))
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "a", 3L, 3L, 1000000L),
      (2L, "b", 2L, 4L, 1333333L)))
  }

  // ------------------------------------------------ T28 vocab overlap

  test("vocab overlap: hand-counted matrix including the zero pair") {
    val corpus = Seq(
      ("A", "x y z"), ("A", "x w"),        // V_A = {x, y, z, w}
      ("B", "x y q"),                      // V_B = {x, y, q}
      ("C", "m n")                         // V_C = {m, n} — disjoint
    ).toDF("source", "text")
    val got = Retrieval.vocabOverlap(corpus,
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text"))
      .as[(String, String, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    // A∩B = {x, y} = 2; union = 5 -> 400000 ppm
    assert(got(("A", "B")) == ((4L, 3L, 2L, 400000L)))
    assert(got(("A", "C")) == ((4L, 2L, 0L, 0L)), "zero pair reports 0")
    assert(got(("B", "C")) == ((3L, 2L, 0L, 0L)))
  }

  test("vocab overlap: duplicate words collapse to set semantics") {
    val corpus = Seq(("A", "x x x"), ("B", "x")).toDF("source", "text")
    val got = Retrieval.vocabOverlap(corpus,
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text"))
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", "B", 1L, 1L, 1L, 1000000L)))
  }
}
