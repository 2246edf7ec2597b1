package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F17b: dictionary-compressed round-trips, the dictionary's actual
  * win on small similar documents, and loud edges.
  */
class ZstdDictSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = (0 until 400).map(i =>
    (i.toLong, s"""{"user":"u$i","event":"click","page":"/catalog/item-$i","ts":${1700000000 + i}}"""))

  test("dictionary round-trip is bit-exact incl. empty and binary payloads") {
    val rows = corpus :+ (9998L, "") :+ (9999L, new String(
      Array.tabulate(64)(i => (i % 7 + 'a').toChar)))
    val df = rows.toDF("id", "v")
      .select(col("id"), encode(col("v"), "UTF-8").as("payload"))
    val dict = ZstdDict.train(df, col("payload"), dictSize = 4096)
    val z = ZstdDict.compress(df, col("id"), col("payload"), dict)
    val back = ZstdDict.decompress(z, col("id"), col("z"), dict)
      .select(col("id"), decode(col("payload"), "UTF-8").as("v"))
      .as[(Long, String)].collect().toMap
    rows.foreach { case (id, v) => assert(back(id) == v, s"id $id diverged") }
  }

  test("the dictionary beats no-dict compression on small similar docs") {
    val df = corpus.toDF("id", "v")
      .select(col("id"), encode(col("v"), "UTF-8").as("payload"))
    val dict = ZstdDict.train(df, col("payload"), dictSize = 4096)
    val withDict = ZstdDict.compress(df, col("id"), col("payload"), dict)
      .agg(sum(length(col("z")))).head.getLong(0)
    val noDict = df.as[(Long, Array[Byte])].collect()
      .map(r => com.github.luben.zstd.Zstd.compress(r._2, 3).length.toLong).sum
    assert(withDict < noDict,
      s"dict $withDict >= no-dict $noDict — the dictionary should win here")
  }

  test("training with no samples is loud") {
    val empty = Seq.empty[(Long, Array[Byte])].toDF("id", "payload")
    intercept[IllegalArgumentException] {
      ZstdDict.train(empty, col("payload"), dictSize = 1024)
    }
  }

  test("decompressing with the WRONG dictionary fails, never corrupts silently") {
    val df = corpus.toDF("id", "v")
      .select(col("id"), encode(col("v"), "UTF-8").as("payload"))
    val dict = ZstdDict.train(df, col("payload"), dictSize = 4096)
    val other = ZstdDict.train(
      (0 until 300).map(i => (i.toLong, s"completely different corpus line $i with other words"))
        .toDF("id", "v")
        .select(col("id"), encode(col("v"), "UTF-8").as("payload")),
      col("payload"), dictSize = 4096)
    val z = ZstdDict.compress(df, col("id"), col("payload"), dict)
    intercept[Exception] {
      ZstdDict.decompress(z, col("id"), col("z"), other).count()
    }
  }
}
