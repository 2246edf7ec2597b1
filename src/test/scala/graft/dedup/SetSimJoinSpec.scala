package graft.dedup

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SetSimJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  /** Run on (id, space-joined tokens) docs; return (a, b, jac_ppm). */
  private def run(docs: Seq[(Long, String)], tau: Long): Set[(Long, Long, Long)] = {
    val df = docs.toDF("id", "text")
    SetSimJoin.prefixJaccardJoin(df, col("id"), split(col("text"), " "), tau)
      .select(col("a"), col("b"), col("jaccard_ppm"))
      .as[(Long, Long, Long)].collect().toSet
  }

  private def ref(docs: Seq[(Long, String)], tau: Long): Set[(Long, Long, Long)] =
    SetSimJoin.bruteForceRef(
      docs.map { case (i, t) => i -> t.split(" ").filter(_.nonEmpty).toSet }.toMap,
      tau).toSet

  test("matches brute force on a mixed corpus at several thresholds") {
    // rare + hot tokens, near-dups, disjoint docs, varying sizes
    val docs = Seq(
      1L -> "the quick brown fox jumps",
      2L -> "the quick brown fox leaps",
      3L -> "the quick red fox jumps high",
      4L -> "entirely different words here",
      5L -> "the quick brown fox jumps",
      6L -> "the",
      7L -> "quick the",
      8L -> "words different entirely here extra")
    for (tau <- Seq(200000L, 500000L, 600000L, 800000L, 1000000L))
      assert(run(docs, tau) == ref(docs, tau), s"tau=$tau diverged")
  }

  test("pair exactly AT the threshold is kept, just below is dropped") {
    // |A|=|B|=3, inter=2 -> union 4 -> exactly 500000 ppm
    val docs = Seq(1L -> "a b c", 2L -> "a b d")
    assert(run(docs, 500000L) == Set((1L, 2L, 500000L)))
    assert(run(docs, 500001L).isEmpty)
  }

  test("identical docs score 1000000; disjoint docs produce no row") {
    val docs = Seq(1L -> "x y z", 2L -> "x y z", 3L -> "p q r")
    assert(run(docs, 1000000L) == Set((1L, 2L, 1000000L)))
  }

  test("duplicate tokens collapse (SET semantics) and empties drop") {
    // "a a b" is the set {a,b}; "a  b" splits with an empty token
    val docs = Seq(1L -> "a a b", 2L -> "a  b")
    assert(run(docs, 1000000L) == Set((1L, 2L, 1000000L)))
  }

  test("size band: tau*|B| <= |A| filter cannot drop a qualifying pair") {
    // big doc fully containing a small one: jac = |small|/|big|
    val docs = Seq(1L -> "a b c d e f g h i j", 2L -> "a b c d e")
    // jac = 5/10 = 500000
    assert(run(docs, 500000L) == Set((1L, 2L, 500000L)))
    assert(run(docs, 500000L) == ref(docs, 500000L))
  }

  test("sizes and intersection counts are reported exactly") {
    val df = Seq(1L -> "a b c", 2L -> "b c d").toDF("id", "text")
    val row = SetSimJoin.prefixJaccardJoin(df, col("id"),
        split(col("text"), " "), 300000L)
      .select(col("n_a"), col("n_b"), col("n_inter"), col("jaccard_ppm"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(row == Seq((3L, 3L, 2L, 500000L)))
  }

  // -------------------------------------------------- D18 containment

  private def runC(docs: Seq[(Long, String)], tau: Long): Set[(Long, Long, Long)] = {
    val df = docs.toDF("id", "text")
    SetSimJoin.prefixContainmentJoin(df, col("id"), split(col("text"), " "), tau)
      .select(col("a"), col("b"), col("containment_ppm"))
      .as[(Long, Long, Long)].collect().toSet
  }

  private def refC(docs: Seq[(Long, String)], tau: Long): Set[(Long, Long, Long)] =
    SetSimJoin.bruteForceContainmentRef(
      docs.map { case (i, t) => i -> t.split(" ").filter(_.nonEmpty).toSet }.toMap,
      tau).toSet

  test("containment matches brute force on a mixed corpus") {
    val docs = Seq(
      1L -> "a b c",
      2L -> "a b c d e f g h",
      3L -> "a b x",
      4L -> "p q r",
      5L -> "a b c")
    for (tau <- Seq(500000L, 666666L, 800000L, 1000000L))
      assert(runC(docs, tau) == refC(docs, tau), s"tau=$tau diverged")
  }

  test("containment is DIRECTIONAL: small-in-big holds, big-in-small fails") {
    val docs = Seq(1L -> "a b c", 2L -> "a b c d e f")
    // |1∩2|/|1| = 3/3 = 1.0; |2∩1|/|2| = 3/6 = 0.5
    assert(runC(docs, 800000L) == Set((1L, 2L, 1000000L)))
    assert(runC(docs, 500000L) ==
      Set((1L, 2L, 1000000L), (2L, 1L, 500000L)))
  }

  test("containment: exact-threshold pair kept, just-below dropped") {
    // |A∩B|/|A| = 4/5 = exactly 800000
    val docs = Seq(1L -> "a b c d e", 2L -> "a b c d x y")
    assert(runC(docs, 800000L) == Set((1L, 2L, 800000L)))
    assert(runC(docs, 800001L).isEmpty)
  }

  test("identical docs contain each other both ways") {
    val docs = Seq(1L -> "x y z", 2L -> "x y z")
    assert(runC(docs, 1000000L) ==
      Set((1L, 2L, 1000000L), (2L, 1L, 1000000L)))
  }
}
