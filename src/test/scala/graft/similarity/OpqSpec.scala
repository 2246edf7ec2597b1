package graft.similarity

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val dim = 64
  val sg = Opq.signs(dim)

  /** Correlated fixture: variance concentrated in the first sub-space —
    * the case plain PQ handles worst and OPQ exists to fix.
    */
  private def skewed(n: Int, seed: Int): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n) { i =>
      val v = Array.tabulate(dim)(j =>
        if (j < 8) rnd.nextGaussian() * 10 else rnd.nextGaussian() * 0.1)
      (i.toLong, v)
    }
  }

  test("codegen matches the reference butterfly; transform is orthonormal") {
    val data = skewed(50, 71)
    val df = data.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    val got = df.select(col("id"), Opq.rotate(col("v"), dim).as("r"))
      .as[(Long, Seq[Double])].collect().toMap
    data.foreach { case (id, v) =>
      val expect = Opq.rotateRef(v, sg)
      assert(got(id).toArray.zip(expect).forall { case (a, b) => math.abs(a - b) < 1e-12 },
        s"codegen/reference mismatch for $id")
      // norm preserved (orthonormality)
      val n0 = math.sqrt(v.map(x => x * x).sum)
      val n1 = math.sqrt(expect.map(x => x * x).sum)
      assert(math.abs(n0 - n1) < 1e-9 * math.max(1, n0))
    }
    // pairwise dot products preserved
    val (_, a) = data(0); val (_, b) = data(1)
    val d0 = a.zip(b).map { case (x, y) => x * y }.sum
    val d1 = Opq.rotateRef(a, sg).zip(Opq.rotateRef(b, sg)).map { case (x, y) => x * y }.sum
    assert(math.abs(d0 - d1) < 1e-9 * math.max(1, math.abs(d0)))
  }

  test("hadamard rotate: interpreted eval matches codegen") {
    val data = skewed(100, 74)
    def run(codegen: Boolean): Map[Long, Seq[Double]] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      import s.implicits._
      data.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
        .select(col("id"), Opq.rotate(col("v"), dim).as("r"))
        .as[(Long, Seq[Double])].collect().toMap
    }
    assert(run(codegen = true) == run(codegen = false))
  }

  test("rotation balances sub-space variance on correlated data") {
    val data = skewed(2000, 72)
    def subspaceShares(rows: Seq[Array[Double]]): Seq[Double] = {
      val m = 8; val sub = dim / m
      val e = Array.fill(m)(0.0)
      rows.foreach { v =>
        var s = 0
        while (s < m) {
          var j = 0
          while (j < sub) { e(s) += v(s * sub + j) * v(s * sub + j); j += 1 }
          s += 1
        }
      }
      val tot = e.sum
      e.map(_ / tot).toSeq
    }
    val before = subspaceShares(data.map(_._2))
    val after = subspaceShares(data.map(d => Opq.rotateRef(d._2, sg)))
    assert(before.max > 0.9, s"fixture must be skewed, max share ${before.max}")
    assert(after.max < 0.2, s"rotation must spread energy, max share ${after.max}")
  }

  test("rotated PQ beats plain PQ recall on correlated data") {
    // unit-normalize so cosine brute force and L2 ADC agree (the
    // standard cosine-PQ recipe, as in PqSpec)
    val data = skewed(600, 73).map { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(x => (x / n).toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "embedding")
    val corpus = df.select(col("vec_id").as("cand_id"), col("embedding"))
    val queries = df.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Ann.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet

    def recallWith(rot: Boolean): Double = {
      def prep(d: org.apache.spark.sql.DataFrame, idAs: String) = {
        val base = d.withColumnRenamed(d.columns(0), idAs)
        if (rot)
          base.select(col(idAs), transform(Opq.rotate(col("embedding"), dim),
            x => x.cast("float")).as("embedding"))
        else base
      }
      val c = prep(corpus.toDF("cand_id", "embedding"), "cand_id")
      val q = prep(queries.toDF("query_id", "embedding"), "query_id")
      val cb = Pq.trainCodebooks(c, m = 8, k = 16, subDim = 8, iterations = 2)
      val codes = Pq.encode(c, cb, m = 8, subDim = 8)
      // shortlist recall: does the true top-5 survive into the ADC
      // top-60 (10% of the corpus)? The metric that decides whether
      // shortlist+rerank can recover the answer.
      val got = Pq.adcTopK(q, codes, cb, m = 8, subDim = 8, k = 60)
        .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
      (exact intersect got).size.toDouble / exact.size
    }

    val plain = recallWith(rot = false)
    val rotated = recallWith(rot = true)
    assert(rotated >= plain,
      s"rotation must not hurt shortlist recall: plain=$plain rotated=$rotated")
    assert(rotated >= 0.6, s"rotated shortlist recall too low: $rotated")
  }
}
