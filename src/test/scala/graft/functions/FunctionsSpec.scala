package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tokenCount / avgTokenLen / stopwordHits") {
    val df = Seq("the cat sat on a mat").toDF("text")
    val r = df.select(
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.stopwordHits(col("text"), Seq("the", "a")).as("s"),
      TextFunctions.avgTokenLen(col("text")).as("l")).head()
    assert(r.getAs[Int]("n") == 6)
    assert(r.getAs[Int]("s") == 2)
    assert(math.abs(r.getAs[Double]("l") - (20 - 5) / 6.0) < 1e-12)
  }

  test("fingerprint is canonical md5 (known value, whitespace-insensitive)") {
    val df = Seq("  Hello   World ", "hello world").toDF("text")
    val fps = df.select(TextFunctions.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
  }

  test("char and word shingles") {
    val df = Seq("abcd").toDF("text")
    assert(df.select(TextFunctions.charShingles(col("text"), 3)).as[Seq[String]].head()
      == Seq("abc", "bcd"))
    val wdf = Seq("w1 w2 w3 w4").toDF("text")
    assert(wdf.select(TextFunctions.wordShingles(col("text"), 3)).as[Seq[String]].head()
      == Seq("w1 w2 w3", "w2 w3 w4"))
  }

  test("langId picks max-hit profile with lexicographic tiebreak") {
    val profiles = Seq("en" -> Seq("the"), "fr" -> Seq("le"), "aa" -> Seq("zz"))
    val df = Seq("the le the", "le le the", "nothing here").toDF("text")
    val got = df.select(TextFunctions.langId(col("text"), profiles)).as[String].collect().toSeq
    assert(got == Seq("en", "fr", "aa")) // last: all-zero hits → smallest code
  }

  test("langIdBigram scores weighted bigram occurrences") {
    val profiles = Seq(
      "en" -> Seq("th" -> 3, "he" -> 2, "er" -> 1),
      "de" -> Seq("ch" -> 3, "ei" -> 2, "en" -> 1),
      "aa" -> Seq("zz" -> 1))
    val df = Seq(
      "the weather there",         // th×2? the/there → th, he hits
      "ich scheine einen schein",  // ch/ei/en heavy
      "qqq").toDF("text")
    val got = df.select(TextFunctions.langIdBigram(col("text"), profiles))
      .as[String].collect().toSeq
    assert(got == Seq("en", "de", "aa")) // all-zero → smallest code
  }

  test("substringCount arithmetic") {
    val df = Seq("ababab").toDF("text")
    assert(df.select(TextFunctions.substringCount(col("text"), "ab")).as[Long].head() == 3L)
  }

  test("vector dot/norm/cosine on known values") {
    val df = Seq((Array(1f, 0f, 2f), Array(2f, 1f, 0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.norm(col("a")).as("n"),
      VectorFunctions.cosine(col("a"), col("a")).as("c"),
      VectorFunctions.l2sq(col("a"), col("b")).as("e")).head()
    assert(r.getAs[Double]("d") == 2.0)
    assert(math.abs(r.getAs[Double]("n") - math.sqrt(5)) < 1e-12)
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
    assert(r.getAs[Double]("e") == (1 + 1 + 4).toDouble)
  }
}
