package graft.similarity

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  lazy val e = spark.read.parquet(s"$dir/embeddings.parquet")
  // PQ quantizes L2; for a cosine objective, encode UNIT vectors (L2 on
  // the unit sphere orders like cosine — the standard cosine-PQ recipe)
  lazy val unit = e.select(col("vec_id"),
    transform(col("embedding"), x =>
      (x.cast("double") / graft.functions.VectorFunctions.norm(col("embedding")))
        .cast("float")).as("embedding"))
  lazy val corpus = unit.select(col("vec_id").as("cand_id"), col("embedding"))
  lazy val queries = unit.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding"))

  test("codes compress to m small integers per row, all rows encoded") {
    val cb = Pq.strideCodebooks(corpus, m = 4, k = 16, subDim = 16, stride = 11)
    val codes = Pq.encode(corpus, cb, m = 4, subDim = 16)
    val n = corpus.count()
    assert(codes.count() == n * 4)
    val rng = codes.agg(min("code"), max("code")).as[(Long, Long)].head()
    assert(rng._1 >= 0 && rng._2 < 16)
  }

  test("trained codebooks + ADC shortlist + exact re-rank recovers brute-force neighbors") {
    val exact = Ann.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val cb = Pq.trainCodebooks(corpus, m = 4, k = 16, subDim = 16, iterations = 2)
    val codes = Pq.encode(corpus, cb, m = 4, subDim = 16)
    val got = Pq.adcTopKRerank(queries, corpus, codes, cb,
        m = 4, subDim = 16, k = 5, shortlist = 150)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@5=$recall (expected >= 0.6 with shortlist 150)")
  }
}
