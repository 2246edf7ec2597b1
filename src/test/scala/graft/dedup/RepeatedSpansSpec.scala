package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RepeatedSpansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], w: Int) =
    Dedup.repeatedSpans(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), w)
      .as[(Long, Long, Long, Long)].collect().toList.sorted

  // distinct filler tokens fNNN never collide across docs
  private def filler(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("a planted 60-token duplicate across two docs is one exact span") {
    val dup = (0 until 60).map(i => s"d$i")
    val docA = (filler("a", 10) ++ dup ++ filler("b", 10)).mkString(" ")
    val docB = (filler("c", 25) ++ dup ++ filler("e", 5)).mkString(" ")
    val got = run(Seq((1L, docA), (2L, docB)), w = 8)
    // keep-first: doc 1 owns the span; doc 2's copy starts at pos 25
    assert(got == List((2L, 25L, 84L, 60L)))
  }

  test("within-doc repeats count too, first occurrence kept") {
    val dup = (0 until 20).map(i => s"d$i")
    val doc = (dup ++ filler("x", 7) ++ dup).mkString(" ")
    val got = run(Seq((1L, doc)), w = 8)
    assert(got == List((1L, 27L, 46L, 20L)))
  }

  test("nearby spans coalesce, distant spans stay separate") {
    val d1 = (0 until 12).map(i => s"p$i")
    val d2 = (0 until 12).map(i => s"q$i")
    // doc2 repeats d1, then a >w gap of unique tokens, then d2
    val docA = (d1 ++ filler("m", 30) ++ d2).mkString(" ")
    val docB = (d1 ++ filler("z", 20) ++ d2).mkString(" ")
    val got = run(Seq((1L, docA), (2L, docB)), w = 8)
    assert(got == List((2L, 0L, 11L, 12L), (2L, 32L, 43L, 12L)))
  }

  test("no duplicates -> no spans; short docs are safe") {
    val got = run(Seq((1L, "a b c"), (2L, filler("u", 40).mkString(" "))),
      w = 8)
    assert(got.isEmpty)
  }
}
