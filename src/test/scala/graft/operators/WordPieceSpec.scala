package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T37: greedy longest-match-first WordPiece segmentation — the
  * MaxMatch anchors, the reconstruction identity, and the loud
  * character-coverage boundary.
  */
class WordPieceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def seg(words: Seq[String], vocab: Seq[String])
      : Map[String, Seq[String]] =
    WordPiece.encode(words.toDF("w"), vocab.toDF("piece"))
      .orderBy("w", "pos").collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) => w -> rows.map(_.getString(2)).toSeq }

  test("longest match wins at every position") {
    val vocab = Seq("a", "b", "c", "ab", "bc", "abc")
    // pos 1: 'abcb' is no piece, 'abc' is -> abc; then 'bc'
    assert(seg(Seq("abcbc"), vocab)("abcbc") == Seq("abc", "bc"))
    // greedy is leftmost-longest, not fewest-pieces: 'ab' beats 'a'
    assert(seg(Seq("abab"), vocab)("abab") == Seq("ab", "ab"))
  }

  test("greedy can differ from fewest-pieces (the classic MaxMatch trap)") {
    // fewest-pieces would choose a|bcd (2); greedy eats 'abc' first
    val vocab = Seq("a", "b", "c", "d", "abc", "bcd")
    assert(seg(Seq("abcd"), vocab)("abcd") == Seq("abc", "d"))
  }

  test("singles-only vocab degenerates to characters") {
    val vocab = Seq("x", "y")
    assert(seg(Seq("xyx"), vocab)("xyx") == Seq("x", "y", "x"))
  }

  test("reconstruction identity over the real trained inventory") {
    val docs = graft.sources.Tables.load(
      spark, "/root/testdata/sf0.001", "documents")
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct().limit(200)
    val (vocab, _) = Unigram.train(docs, col("text"))
    val out = WordPiece.encode(words, vocab)
    val rebuilt = out.orderBy("w", "pos").groupBy("w")
      .agg(concat_ws("", collect_list(col("piece"))).as("r"),
        max(length(col("piece"))).as("maxp"))
    assert(rebuilt.filter(col("r") =!= col("w")).count() == 0)
    assert(rebuilt.filter(col("maxp") > Unigram.MaxPiece).count() == 0)
  }

  test("missing single character is loud, never a silent drop") {
    val e = intercept[IllegalArgumentException] {
      WordPiece.encode(Seq("axb").toDF("w"), Seq("a", "b").toDF("piece"))
    }
    assert(e.getMessage.contains("missing single character"))
  }
}
