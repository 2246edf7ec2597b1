package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the hand-written codegen expressions — the code most
  * able to hide an off-by-one. Each native result is checked against an
  * independent scala-collection reference over randomized inputs (one
  * Spark job per property run keeps this fast: inputs are batched into a
  * single DataFrame).
  */
class NativePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic scalacheck sampling (no scalatest bridge on the
    * classpath): n samples from fixed seeds.
    */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val sortedLongs: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted.toArray)

  test("binary_meta: interpreted eval equals codegen, and both equal stubDecode") {
    val payloads = samples(Gen.chooseNum(0, 2000), 60)
    def run(codegen: Boolean): Seq[(Long, Int, Int, Int)] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      import s.implicits._
      payloads.map(n => "x" * n).toDF("t")
        .select(graft.multimodal.Binary.binary_meta(encode(col("t"), "UTF-8")).as("m"))
        .select(col("m.byte_len"), col("m.width"), col("m.height"), col("m.channels"))
        .as[(Long, Int, Int, Int)].collect().toSeq
    }
    val want = payloads.map(n => graft.multimodal.Binary.stubDecode(Array.fill(n)('x'.toByte)))
    assert(run(codegen = true) == want && run(codegen = false) == want)
  }

  test("sorted_intersect_count equals set intersection size on random sorted arrays") {
    val pairs = samples(Gen.zip(sortedLongs, sortedLongs), 120)
    val got = pairs.toDF("a", "b")
      .select(NativeExpressions.sorted_intersect_count(col("a"), col("b")))
      .as[Long].collect().toSeq
    val want = pairs.map { case (a, b) => (a.toSet intersect b.toSet).size.toLong }
    assert(got == want)
  }

  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    words <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "déjà", "x"))
  } yield words.mkString(" ")

  test("word_shingles equals the sliding-window reference on random token streams") {
    val texts = samples(text, 120)
    val got = texts.toDF("t")
      .select(ShingleExpressions.word_shingles(col("t"), 3))
      .as[Seq[String]].collect().toSeq
    val want = texts.map(_.split(" ", -1).toSeq.sliding(3).toSeq
      .filter(_.size == 3).map(_.mkString(" ")))
    assert(got == want)
  }

  test("char_shingles equals the sliding-window reference (codepoint-aware)") {
    val texts = samples(text, 120)
    val got = texts.toDF("t")
      .select(ShingleExpressions.char_shingles(col("t"), 2))
      .as[Seq[String]].collect().toSeq
    // codePoints-based reference (matches UTF8String.substringSQL)
    val want = texts.map { t =>
      val cps = t.codePoints().toArray.toSeq
      cps.sliding(2).toSeq.filter(_.size == 2)
        .map(w => new String(w.toArray, 0, 2))
    }
    assert(got == want)
  }

  test("md5_prefix24 equals the builtin conv(substring(md5)) chain") {
    val df = samples(text, 120).toDF("t")
    val native = df.select(NativeExpressions.md5_prefix24(col("t")))
      .as[Long].collect().toSeq
    val builtin = df.select(
      conv(substring(md5(col("t")), 1, 6), 16, 10).cast("long"))
      .as[Long].collect().toSeq
    assert(native == builtin)
  }
}
