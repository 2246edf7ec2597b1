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

  test("LSH-locality seeding trains usable centroids with the same recall contract") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = e.select(col("vec_id").as("cand_id"), col("embedding"))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Ann.bruteForceTopK(queries, corpus, 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet

    val trained = Ann.trainCentroidsLsh(corpus, k = 10, dim = 64, iterations = 3)
    val n = trained.count()
    assert(n == 10, s"expected 10 centroids, got $n")
    assert(trained.select(size(col("embedding"))).as[Int].collect().toSet == Set(64))
    // deterministic: a second build is bit-identical
    val again = Ann.trainCentroidsLsh(corpus, k = 10, dim = 64, iterations = 3)
      .select(col("centroid_id"), col("embedding").cast("string"))
      .as[(Long, String)].collect().toSet
    val first = trained.select(col("centroid_id"), col("embedding").cast("string"))
      .as[(Long, String)].collect().toSet
    assert(again == first, "locality seeding must be deterministic")

    val assigned = Ann.ivfAssign(corpus, trained)
    val approx = Ann.ivfTopK(queries, assigned, trained, k = 5, nprobe = 3)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val r = (exact intersect approx).size.toDouble / exact.size
    info(f"IVF recall@5 with LSH-seeded centroids, nprobe=3: $r%.2f")
    assert(r >= 0.5, s"LSH-seeded IVF recall $r too low")
  }

  test("LSH seeding plans as a distributed top-k over cells, no global sort of the corpus") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = e.select(col("vec_id").as("cand_id"), col("embedding"))
    val seeds = Ann.trainCentroidsLsh(corpus, k = 8, dim = 64, iterations = 0)
    val plan = seeds.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"cell top-k should be a distributed top-k:\n$plan")
    assert(!plan.contains("rangepartitioning(4"),
      "no range-partitioned global sort of the corpus expected")
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
