package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShingleExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the builtin HOF formulations the native expressions replaced — kept
  // here as the semantic reference
  private def charShinglesHof(text: Column, n: Int): Column =
    filter(
      transform(sequence(lit(1), greatest(length(text) - lit(n - 1), lit(1))),
        i => text.substr(i, lit(n))),
      g => length(g) === lit(n))
  private def wordShinglesHof(text: Column, n: Int): Column = {
    val ts = split(text, " ")
    filter(
      transform(sequence(lit(0), greatest(size(ts) - lit(n), lit(0))),
        i => concat_ws(" ", slice(ts, i + lit(1), lit(n)))),
      g => size(split(g, " ")) === lit(n))
  }

  val texts = Seq(
    "the quick brown fox", "ab", "", "a", "one two", "x y z w v",
    "double  space", " leading", "trailing ", "héllo wörld ünïcode")

  test("char_shingles matches the builtin HOF form on all inputs") {
    for (n <- Seq(2, 3, 5)) {
      val df = texts.toDF("t")
      val native = df.select(ShingleExpressions.char_shingles(col("t"), n))
        .as[Seq[String]].collect().toSeq
      val hof = df.select(charShinglesHof(col("t"), n)).as[Seq[String]].collect().toSeq
      assert(native == hof, s"n=$n")
    }
  }

  test("word_shingles matches the builtin HOF form on all inputs") {
    for (n <- Seq(2, 3)) {
      val df = texts.toDF("t")
      val native = df.select(ShingleExpressions.word_shingles(col("t"), n))
        .as[Seq[String]].collect().toSeq
      val hof = df.select(wordShinglesHof(col("t"), n)).as[Seq[String]].collect().toSeq
      assert(native == hof, s"n=$n")
    }
  }

  test("null text yields null arrays") {
    val df = Seq(Option.empty[String], Some("abc")).toDF("t")
    val got = df.select(ShingleExpressions.char_shingles(col("t"), 2).isNull)
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, false))
  }
}
