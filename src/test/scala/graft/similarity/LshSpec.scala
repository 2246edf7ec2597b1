package graft.similarity

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LshSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hyperplane band keys are deterministic and identical for identical vectors") {
    val v = Array.tabulate(8)(i => i.toFloat)
    val df = Seq((1L, v), (2L, v), (3L, v.map(-_))).toDF("id", "embedding")
    val keys = df.select(col("id"),
        Ann.hyperplaneBandKeys(col("embedding"), 8, 2, 4).as("k"))
      .as[(Long, Seq[String])].collect().toMap
    assert(keys(1L) == keys(2L))
    assert(keys(1L) != keys(3L)) // antipodal vector flips every sign bit
  }

  test("LSH top-k recall vs brute force on the real embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = e.select(col("vec_id").as("cand_id"), col("embedding"))
    val exact = Ann.bruteForceTopK(queries, corpus, 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(queries, corpus, dim = 64, k = 5,
        bands = 4, bitsPerBand = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"LSH recall@5 = $recall%.2f (candidates are deterministic)")
    assert(recall >= 0.3, s"recall $recall collapsed — hashing or banding broke")
    // and it must actually prune: candidate set smaller than all-pairs
    assert(approx.size <= exact.size * 2)
  }
}
