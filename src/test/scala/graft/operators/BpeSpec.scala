package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("learns the classic merge sequence on a hand-checkable corpus") {
    // freq: "low" x3, "lower" x2 — pair counts round 1 (overlaps incl.):
    // (l,o) 5, (o,w) 5, (w,e) 2, (e,r) 2 → tie (l,o)/(o,w) broken by
    // left asc → merge 1 = (l,o). Round 2: (lo,w) 5 wins → "low".
    val d = docs(Seq((1L, "low low lower"), (2L, "low lower")))
    val m = Bpe.trainMerges(d, col("text"), merges = 3)
      .as[(Long, String, String, Long)].collect().toList
    assert(m.take(2) == List((1L, "l", "o", 5L), (2L, "lo", "w", 5L)))
    // round 3: remaining pairs (low,e) 2, (e,r) 2 → tie broken left asc
    // ("e" < "low") → (e, r)
    assert(m(2) == (3L, "e", "r", 2L))
  }

  test("left-to-right non-overlap: aaa under a+a gives aa,a") {
    // corpus "aaa": round 1 pair (a,a) cnt 2 (overlap counted), merged
    // left-to-right → [aa, a]; round 2 pair (aa,a) cnt 1 → [aaa]
    val d = docs(Seq((1L, "aaa")))
    val m = Bpe.trainMerges(d, col("text"), merges = 2)
      .as[(Long, String, String, Long)].collect().toList
    assert(m == List((1L, "a", "a", 2L), (2L, "aa", "a", 1L)))
  }

  test("sentinel rounds: exhausted corpora emit no merges, state intact") {
    val d = docs(Seq((1L, "ab ab")))
    // merges possible: (a,b) only — rounds 2..4 are sentinel no-ops
    val m = Bpe.trainMerges(d, col("text"), merges = 4)
      .as[(Long, String, String, Long)].collect().toList
    assert(m == List((1L, "a", "b", 2L)))
    val counts = Bpe.tokenCounts(d, col("doc_id"), col("text"), merges = 4)
      .as[(Long, Long, Long)].collect().toList
    assert(counts == List((1L, 2L, 2L))) // 2 words, 1 subword each
  }

  test("tokenCounts: whitespace vs subword accounting per doc") {
    val d = docs(Seq((1L, "low lower low"), (2L, "newest")))
    // 2 merges: (l,o) then (lo,w) → "low"=1 token, "lower"=low+e+r=3,
    // "newest" stays 6 chars
    val got = Bpe.tokenCounts(d, col("doc_id"), col("text"), merges = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (id, ws, bpe) => id -> (ws, bpe) }.toMap
    assert(got(1L) == (3L, 5L)) // 3 ws tokens; 1 + 3 + 1 subwords
    assert(got(2L) == (1L, 6L))
  }

  test("oracle SQL replays the identical trajectory in Spark SQL") {
    // the generated DuckDB oracle is ANSI enough for Spark's SQL engine
    // apart from engine-local table refs + generate_series/string_split
    // names — run a transliterated probe corpus through both paths
    val d = docs(Seq((1L, "low low lower widest"), (2L, "low newest")))
    d.createOrReplaceTempView("bpe_probe_docs")
    val sql = Bpe.tokenCountsOracle("bpe_probe_docs", "doc_id", "text", 4)
      .replace("AS MATERIALIZED (", "AS (")
      .replace("unnest(string_split(text, ' '))", "explode(split(text, ' '))")
      .replace("unnest(generate_series(1, length(w)))",
        "explode(sequence(1, length(w)))")
    val viaSql = spark.sql(sql).as[(Long, Long, Long)].collect().toList
    val viaApi = Bpe.tokenCounts(d, col("doc_id"), col("text"), 4)
      .orderBy(col("doc_id")).as[(Long, Long, Long)].collect().toList
    assert(viaSql == viaApi)
  }

  // ---- r11: byte-level (GPT-2) alphabet ----

  test("bytesToUnicode: printable bytes keep themselves, 68 borrow 256+ (r11)") {
    val m = Bpe.bytesToUnicode
    assert(m.size == 256)
    assert(m('a'.toInt) == "a" && m('!'.toInt) == "!" && m(255) == "ÿ")
    // the 68 non-printable bytes (0-32, 127-160, 173) map to 256+i in
    // byte order — the public GPT-2 rule
    assert(m(0) == "Ā" && m(1) == "ā" && m(32) == "Ġ")
    assert(m(127) == "ġ" && m(173) == "Ń")
    assert(m.distinct.size == 256, "the mapping must be a bijection")
  }

  test("byte-level: multi-byte UTF-8 round-trips with no unknown tokens (r11)") {
    // 'é' is 0xC3 0xA9 → symbols "Ã","©"; the most frequent pair is
    // (Ã, ©), so merge 1 fuses the two bytes back into one token
    val d = docs(Seq((1L, "éé éa"), (2L, "éé")))
    val (merges, endState) = Bpe.trainByteLevel(d, col("text"), 2)
    val m = merges.orderBy("mrank")
      .as[(Long, String, String, Long)].collect().toList
    assert(m.head._2 == "Ã" && m.head._3 == "©",
      s"first merge should fuse the é bytes, got $m")
    // every word of the corpus segments — no unknown-token holes
    val segs = endState.groupBy(col("w")).count()
      .as[(String, Long)].collect().toMap
    assert(segs.keySet == Set("éé", "éa"))
    // "éé" after (Ã©)+(Ã©) merge 2 → 1 symbol; "éa" → [Ã©, a]
    assert(segs("éé") == 1L && segs("éa") == 2L)
  }
}
