package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T35: unigram-LM trainer invariants — segmentability, the pruning
  * floor (single chars survive), piece-count sanity vs whitespace
  * tokens, and the loud word-length subset boundary.
  */
class UnigramSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "data data pipeline"),
    (2L, "data lake pipeline engine"),
    (3L, "the engine of the data lake"),
    (4L, "lakes and data and pipes")).toDF("doc_id", "text")

  test("every word segments; piece counts in [ceil(len/4), len]") {
    val (_, dp) = Unigram.train(docs, col("text"))
    val perWord = dp.filter(col("pos") === length(col("w")))
      .select(col("w"), col("n")).as[(String, Long)].collect().toMap
    val vocabWords = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct().as[String].collect().toSet
    assert(perWord.keySet == vocabWords)
    perWord.foreach { case (w, n) =>
      assert(n >= (w.length + Unigram.MaxPiece - 1) / Unigram.MaxPiece &&
        n <= w.length, s"$w segmented into $n pieces")
    }
  }

  test("single characters are never pruned; vocab size is bounded") {
    val (vocab, _) = Unigram.train(docs, col("text"))
    val pieces = vocab.select("piece").as[String].collect().toSet
    val chars = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(explode(split(col("w"), "")).as("c"))
      .filter(col("c") =!= "").distinct().as[String].collect().toSet
    assert(chars.subsetOf(pieces), s"pruned chars: ${chars.diff(pieces)}")
    assert(pieces.size <= chars.size + Unigram.Keep)
    // frequent multi-char pieces survive training
    assert(pieces.exists(_.length >= 2))
  }

  test("piece-weight sums prefer frequent subwords deterministically") {
    // "data" appears 5x: the trained model should keep it whole (one
    // 4-char piece beats any split on the fewest-pieces objective)
    val (_, dp) = Unigram.train(docs, col("text"))
    val n = dp.filter(col("w") === "data" && col("pos") === 4)
      .select("n").as[Long].head()
    assert(n == 1L, s"'data' segmented into $n pieces")
  }

  test("segments reconstruct every word exactly, in piece order") {
    val (_, dp) = Unigram.train(docs, col("text"))
    val rebuilt = Unigram.segments(dp)
      .groupBy(col("w"))
      .agg(expr("""array_join(transform(sort_array(collect_list(
             struct(pos, piece))), x -> x.piece), '')""").as("r"))
      .as[(String, String)].collect().toMap
    val vocabWords = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct().as[String].collect().toSet
    assert(rebuilt.keySet == vocabWords)
    rebuilt.foreach { case (w, r) => assert(r == w, s"$w rebuilt as $r") }
  }

  test("segment piece count matches the DP lattice's n per word") {
    val (_, dp) = Unigram.train(docs, col("text"))
    val fromDp = dp.filter(col("pos") === length(col("w")))
      .select(col("w"), col("n")).as[(String, Long)].collect().toMap
    val fromSeg = Unigram.segments(dp).groupBy(col("w"))
      .agg(count(lit(1)).as("k")).as[(String, Long)].collect().toMap
    assert(fromSeg == fromDp)
  }

  test("words beyond MaxLen are rejected loudly") {
    val bad = Seq((1L, "supercalifragilistic word")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Unigram.train(bad, col("text"))
    }
    assert(e.getMessage.contains("pretokenize"))
  }
}
