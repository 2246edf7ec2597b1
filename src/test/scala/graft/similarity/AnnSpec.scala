package graft.similarity

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val corpus = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(-1f, 0f)))
      .toDF("cand_id", "embedding")
    val queries = Seq((0L, Array(1f, 0f))).toDF("query_id", "embedding")
    val got = Ann.bruteForceTopK(queries, corpus, 3)
      .orderBy("rnk").as[(Long, Long, Int)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 2L, 3L)) // self excluded; nearest first
  }

  test("ivf assignment + probe recovers neighbors from probed cells") {
    val corpus = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f) else Array(0f, 1f)
      (i.toLong, Array(base(0) + i * 0.001f, base(1)))
    }.toDF("cand_id", "embedding")
    val centroids = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("centroid_id", "embedding")
    val assigned = Ann.ivfAssign(corpus, centroids)
    assert(assigned.count() == 40)
    // even ids cluster to centroid 0, odd to centroid 1
    val byC = assigned.groupBy("centroid_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byC(0L) == 20 && byC(1L) == 20)
    val queries = Seq((100L, Array(1f, 0.01f))).toDF("query_id", "embedding")
    val top = Ann.ivfTopK(queries, assigned, centroids, k = 5, nprobe = 1)
      .as[(Long, Long, Int)].collect()
    assert(top.length == 5)
    assert(top.forall(_._2 % 2 == 0)) // probed only the x-axis cell
  }

  test("IVF assignment is incremental: assign(delta) ∪ stored = assign(whole)") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("cand_id"), col("embedding"))
    val centroids = e.filter(col("cand_id") % 50 === 0)
      .select(col("cand_id").as("centroid_id"), col("embedding"))
    val day1 = e.filter(col("cand_id") < 300)
    val day2 = e.filter(col("cand_id") >= 300)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("cand_id"), col("centroid_id"))
        .as[(Long, Long)].collect().toSet
    // frozen centroids: the index ingests day2 without re-touching day1
    val incremental = rows(Ann.ivfAssign(day1, centroids)) ++
      rows(Ann.ivfAssign(day2, centroids))
    val whole = rows(Ann.ivfAssign(e, centroids))
    assert(incremental == whole && whole.size == 500)
  }
}
