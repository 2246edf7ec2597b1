package graft.similarity

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  /** Driver-side replay of the exact milli-quantized Lloyd recursion. */
  private def ref(rows: Seq[(Long, Seq[Float])], seedMod: Long,
                  iterations: Int): Map[Long, Long] = {
    val q = rows.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000).toLong).toVector
    }.toMap
    var cent: Map[Long, Vector[Long]] =
      q.filter { case (id, _) => id % seedMod == 0 }
    var assign: Map[Long, Long] = Map.empty
    def signedDiv(s: Long, n: Long): Long =
      if (s >= 0) s / n else -((-s) / n)
    for (_ <- 1 to iterations) {
      assign = q.map { case (id, v) =>
        val best = cent.toSeq.map { case (cid, c) =>
          (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }.min
        id -> best._2
      }
      cent = assign.groupBy(_._2).map { case (cid, members) =>
        val vs = members.keys.toSeq.map(q)
        val dim = vs.head.size
        cid -> Vector.tabulate(dim)(i =>
          signedDiv(vs.map(_(i)).sum, vs.size.toLong))
      }
    }
    assign
  }

  // two tight blobs around (0.1, 0.1) and (-0.2, 0.3); seeds 0 and 50
  private val rows: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(0.10f, 0.10f), 1L -> Seq(0.12f, 0.09f), 2L -> Seq(0.08f, 0.11f),
    50L -> Seq(-0.20f, 0.30f), 51L -> Seq(-0.18f, 0.31f), 52L -> Seq(-0.22f, 0.29f))

  test("two Lloyd passes match the integer reference on two blobs") {
    val got = KMeans.lloydMilli(vecs(rows), col("vec_id"), col("embedding"),
        seedMod = 50L, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == ref(rows, 50L, 2))
    assert(got.values.toSet == Set(0L, 50L))
    assert(got.filter(_._1 < 50).values.forall(_ == 0L))
  }

  test("a point switches cluster after the centroid update pulls it over") {
    // seed 0 at origin, seed 4 far right; id 1..3 cluster near 0.3 —
    // first pass they split between seeds, after update the re-estimated
    // centroid of cluster 0 moves right and captures all of them
    val data: Seq[(Long, Seq[Float])] = Seq(
      0L -> Seq(0.00f), 1L -> Seq(0.30f), 2L -> Seq(0.32f), 3L -> Seq(0.34f),
      4L -> Seq(0.90f))
    for (it <- 1 to 3) {
      val got = KMeans.lloydMilli(vecs(data), col("vec_id"), col("embedding"),
          seedMod = 4L, iterations = it)
        .as[(Long, Long)].collect().toMap
      assert(got == ref(data, 4L, it), s"iterations=$it diverged")
    }
  }

  test("silhouette scores tight separated blobs near ppm-perfect") {
    val got = KMeans.silhouetteMilli(vecs(rows), col("vec_id"),
        col("embedding"), seedMod = 50L, iterations = 2)
      .as[(Long, Long, Long)].collect().map { case (c, n, s) => c -> (n, s) }.toMap
    assert(got.keySet == Set(0L, 50L))
    assert(got.values.forall(_._1 == 3L))
    // blobs are ~0.3 apart with ~0.02 spread: silhouette close to 10⁶
    assert(got.values.forall(_._2 > 950000L))
  }

  test("silhouette of a coin-flip point between two centroids is ~0") {
    // centroids at 0 and 0.4 (stable: members hug the seeds), probe at 0.2
    val data: Seq[(Long, Seq[Float])] = Seq(
      0L -> Seq(0.00f), 1L -> Seq(0.001f), 2L -> Seq(0.199f),
      4L -> Seq(0.40f), 5L -> Seq(0.399f))
    val out = KMeans.silhouetteMilli(vecs(data), col("vec_id"),
        col("embedding"), seedMod = 4L, iterations = 1)
      .as[(Long, Long, Long)].collect().map { case (c, n, s) => c -> (n, s) }.toMap
    // cluster 0 holds the midpoint probe → its mean silhouette is pulled
    // far below cluster 4's
    assert(out(0L)._1 == 3L && out(4L)._1 == 2L)
    assert(out(0L)._2 < out(4L)._2)
  }

  test("ivfTopKMilli with full probe width equals brute force") {
    // 2 clusters (seeds 0, 4); nprobe = 2 covers every partition, so the
    // result must be the exact k-NN by (dist, id)
    val data: Seq[(Long, Seq[Float])] = Seq(
      0L -> Seq(0.00f), 1L -> Seq(0.02f), 2L -> Seq(0.05f),
      4L -> Seq(0.90f), 5L -> Seq(0.88f), 6L -> Seq(0.93f))
    val q = data.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000).toLong).toVector
    }.toMap
    val got = KMeans.ivfTopKMilli(vecs(data), col("vec_id"), col("embedding"),
        seedMod = 4L, iterations = 2, queryFilter = col("vec_id") === 0,
        k = 3, nprobe = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    val brute = q.filter(_._1 != 0L).toSeq
      .map { case (id, v) =>
        (id, v.zip(q(0L)).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      .sortBy { case (id, d) => (d, id) }.take(3)
    assert(got.map(r => (r._2, r._3)) == brute)
    assert(got.map(_._4) == Seq(1L, 2L, 3L))
  }

  test("ivfTopKMilli with nprobe=1 searches only the nearest partition") {
    // query 0 sits in cluster 0; with one probe the far cluster's
    // members must not appear even though k would admit them
    val data: Seq[(Long, Seq[Float])] = Seq(
      0L -> Seq(0.00f), 1L -> Seq(0.02f),
      4L -> Seq(0.90f), 5L -> Seq(0.88f))
    val got = KMeans.ivfTopKMilli(vecs(data), col("vec_id"), col("embedding"),
        seedMod = 4L, iterations = 1, queryFilter = col("vec_id") === 0,
        k = 5, nprobe = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._2).toSet == Set(1L))
  }

  test("negative-sum centroids use the sign-carried integer mean") {
    val data: Seq[(Long, Seq[Float])] = Seq(
      0L -> Seq(-0.10f), 1L -> Seq(-0.15f), 2L -> Seq(-0.12f))
    val got = KMeans.lloydMilli(vecs(data), col("vec_id"), col("embedding"),
        seedMod = 50L, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == ref(data, 50L, 2))
    assert(got.values.toSet == Set(0L))
  }

  // --------------------------------------------- fixed-k seeding contract

  test("seedsTopK: k is an API constant, independent of the corpus size") {
    def corpus(n: Int): Seq[(Long, Seq[Float])] =
      (0 until n).map(i => i.toLong -> Seq(i / 1000.0f))
    val k = 7
    val small = KMeans.seedsTopK(vecs(corpus(50)), col("vec_id"), k)
      .as[Long].collect().toSet
    val big = KMeans.seedsTopK(vecs(corpus(500)), col("vec_id"), k)
      .as[Long].collect().toSet
    assert(small.size == k && big.size == k,
      "seed count must equal k at every corpus size")
    // deterministic: same corpus -> same seeds
    val again = KMeans.seedsTopK(vecs(corpus(500)), col("vec_id"), k)
      .as[Long].collect().toSet
    assert(big == again)
    // the house portable rank: md5-of-decimal-string, id tie-break
    val expect = (0 until 500).map(_.toLong)
      .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id))
      .take(k).toSet
    assert(big == expect)
  }

  test("lloydMilliK: every vector assigned, cluster ids are the k seeds") {
    def corpus(n: Int): Seq[(Long, Seq[Float])] =
      (0 until n).map(i => i.toLong -> Seq((i % 13) / 10.0f, (i % 7) / 10.0f))
    for (n <- Seq(60, 240)) {
      val data = corpus(n)
      val seeds = KMeans.seedsTopK(vecs(data), col("vec_id"), 4)
        .as[Long].collect().toSet
      val got = KMeans.lloydMilliK(vecs(data), col("vec_id"),
          col("embedding"), k = 4, iterations = 2)
        .as[(Long, Long)].collect().toMap
      assert(got.size == n, "every vector must be assigned")
      // cluster labels are the SEED ids (lineage labels): at most k of them
      assert(got.values.toSet.size <= 4)
      assert(got.values.toSet.subsetOf(seeds))
    }
  }
}
