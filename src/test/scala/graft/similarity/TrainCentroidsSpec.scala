package graft.similarity

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainCentroidsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Lloyd iterations improve IVF recall over strided seeds") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = e.select(col("vec_id").as("cand_id"), col("embedding"))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Ann.bruteForceTopK(queries, corpus, 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet

    def recallWith(centroids: org.apache.spark.sql.DataFrame): Double = {
      val assigned = Ann.ivfAssign(corpus, centroids)
      val approx = Ann.ivfTopK(queries, assigned, centroids, k = 5, nprobe = 3)
        .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }

    val trained = Ann.trainCentroids(corpus, k = 10, iterations = 3)
    assert(trained.count() == 10)
    // trained centroids are 64-dim float vectors
    val dims = trained.select(size(col("embedding"))).as[Int].collect().toSet
    assert(dims == Set(64))
    val r = recallWith(trained)
    info(f"IVF recall@5 with trained centroids, nprobe=3: $r%.2f")
    assert(r >= 0.5, s"trained-IVF recall $r too low")
  }

  test("seeding has no single-partition global sort and no driver count") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = e.select(col("vec_id").as("cand_id"), col("embedding"))
    // iterations=0 returns the bare seed selection: it must plan as a
    // distributed top-k (TakeOrderedAndProject), not a global-window sort
    // that funnels the corpus through one task
    val seeds = Ann.trainCentroids(corpus, k = 10, iterations = 0)
    val plan = seeds.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"seed selection should be a distributed top-k:\n$plan")
    assert(seeds.count() == 10)
    assert(seeds.select("centroid_id").as[Long].collect().sorted.toSeq == (0L until 10L))
  }
}
