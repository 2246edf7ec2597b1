package graft

import graft.cdc.Cdc
import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary behavior the 100 TB pipeline will definitely hit: empty
  * batches, null values, unicode, degenerate inputs.
  */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mergeSoftDelete with an empty delta is the identity") {
    val target = Seq((1, "a", "N")).toDF("id", "v", "is_deleted")
    val empty = Seq.empty[(Int, String, String)].toDF("id", "v", "is_deleted")
    val got = Cdc.mergeSoftDelete(target, empty, Seq("id"))
      .as[(Int, String, String)].collect().toSeq
    assert(got == Seq((1, "a", "N")))
  }

  test("mergeSoftDelete into an empty target inserts only non-deleted rows") {
    val empty = Seq.empty[(Int, String, String)].toDF("id", "v", "is_deleted")
    val staged = Seq((1, "a", "N"), (2, "b", "Y")).toDF("id", "v", "is_deleted")
    val got = Cdc.mergeSoftDelete(empty, staged, Seq("id"))
      .as[(Int, String, String)].collect().toSeq
    assert(got == Seq((1, "a", "N")))
  }

  test("mergeSoftDelete matches on null keys (null-safe equality)") {
    val target = Seq((Option.empty[Int], "old", "N")).toDF("id", "v", "is_deleted")
    val staged = Seq((Option.empty[Int], "new", "N")).toDF("id", "v", "is_deleted")
    val got = Cdc.mergeSoftDelete(target, staged, Seq("id"))
      .select("v").as[String].collect().toSeq
    assert(got == Seq("new")) // one row, updated — not a 2-row null mismatch
  }

  test("mergeSoftDelete null non-PK values from the stage overwrite target values") {
    val target = Seq((1, Some("old"), "N")).toDF("id", "v", "is_deleted")
    val staged = Seq((1, Option.empty[String], "N")).toDF("id", "v", "is_deleted")
    val got = Cdc.mergeSoftDelete(target, staged, Seq("id"))
      .select("v").as[Option[String]].collect().toSeq
    assert(got == Seq(None)) // stage wins even when its value is null
  }

  test("deltaSince on an empty source yields an empty, well-typed frame") {
    val empty = Seq.empty[(Int, java.sql.Timestamp)].toDF("id", "ts")
    assert(Cdc.deltaSince(empty, col("ts"), Some(lit("2024-01-01").cast("timestamp")))
      .count() == 0)
  }

  test("fingerprint handles unicode + mixed whitespace canonicalization") {
    val df = Seq("héllo\t wörld\n", "HÉLLO WÖRLD").toDF("text")
    val fps = df.select(TextFunctions.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1)) // case + whitespace insensitive, bytes-safe
  }

  test("tokenCount on empty and single-token strings") {
    val df = Seq("", "one", "a b").toDF("text")
    val got = df.select(TextFunctions.tokenCount(col("text"))).as[Int].collect().toSeq
    assert(got == Seq(1, 1, 2)) // split('') → [''] — documented quirk of split semantics
  }

  test("charShingles shorter than n yields the whole (short) string only") {
    val df = Seq("ab").toDF("text")
    val got = df.select(TextFunctions.charShingles(col("text"), 3)).as[Seq[String]].head()
    assert(got == Seq.empty) // no 3-gram exists in a 2-char string
  }

  test("simhashTable on a single-token corpus is stable") {
    val docs = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "text")
    val h = Dedup.simhashTable(docs, col("doc_id"), col("text"), 8)
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
  }

  test("latestPerKey breaks exact ties deterministically via extra order cols") {
    val df = Seq((1, 10, 100, "a"), (1, 10, 200, "b")).toDF("k", "seq", "sub", "v")
    val got = Cdc.latestPerKey(df, Seq("k"), Seq(col("seq"), col("sub")))
      .select("v").as[String].head()
    assert(got == "b") // higher tiebreak wins
  }

  test("blocked ngram jaccard: docs too short for any gram drop out cleanly") {
    val docs = Seq((1L, "ab", "s"), (2L, "abcdefgh", "s"), (3L, "abcdefgh", "s"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.ngramJaccardPairsBlocked(
        docs, col("doc_id"), col("text"), col("source"), 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 3L))) // the 2-char doc pairs with nothing
  }

  test("blocked ngram jaccard: identical docs in different blocks never pair") {
    val docs = Seq((1L, "abcdefgh", "s1"), (2L, "abcdefgh", "s2"))
      .toDF("doc_id", "text", "source")
    assert(Dedup.ngramJaccardPairsBlocked(
      docs, col("doc_id"), col("text"), col("source"), 3, 0.5).count() == 0)
  }

  test("forwardFill: single observation per key fills a one-bucket grid") {
    val obs = Seq((1L, 5L, 2.5)).toDF("k", "b", "v")
    val got = graft.operators.Resample.forwardFill(obs, col("k"), col("b"), col("v"))
      .select("key", "bucket", "filled").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 5L, 2.5)))
  }

  test("forwardFill: gap buckets carry the last value, not null") {
    val obs = Seq((1L, 1L, 10.0), (1L, 4L, 20.0)).toDF("k", "b", "v")
    val got = graft.operators.Resample.forwardFill(obs, col("k"), col("b"), col("v"))
      .orderBy("bucket").select("bucket", "filled")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 20.0)))
  }

  test("image_meta null payload in, null out") {
    val got = Seq((1L, Option.empty[Array[Byte]]), (2L, Some("x".getBytes("UTF-8"))))
      .toDF("id", "p")
      .select(graft.multimodal.ImageHeader.image_meta(col("p")).as("m"))
      .select(col("m").isNull).as[Boolean].collect().toSeq
    assert(got == Seq(true, true)) // null payload and garbage both yield null
  }

  test("minhash signature of an empty-shingle doc is absent, not an error") {
    val docs = Seq((1L, "one two"), (2L, "one two three four")).toDF("doc_id", "text")
    // doc 1 has no 3-word shingle → no signature row
    val sigs = Dedup.minhashSignatureTable(docs, col("doc_id"), col("text"), 3, 4)
    assert(sigs.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }
}
