package graft.operators

import graft.SparkTestSession
import graft.sketches.Kmv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side hash48: first 12 hex chars of md5(toString) as a long —
    * the JVM reference for what Kmv.hash48 computes in SQL.
    */
  private def hash48Ref(v: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16)
  }

  test("hash48 column matches the JVM reference") {
    val df = (1L to 100L).toDF("id").select(col("id"), Kmv.hash48(col("id")).as("h"))
    df.as[(Long, Long)].collect().foreach { case (id, h) =>
      assert(h == hash48Ref(id.toString), s"id=$id")
    }
  }

  test("weightedBernoulli keeps exactly the rows below the weight threshold") {
    val rows = (1L to 2000L).map(i => (i, (i % 130).toDouble)).toDF("id", "w")
    val kept = Sampling.weightedBernoulli(rows, "id", "w", cap = 100.0)
      .select("id").as[Long].collect().toSet
    val expect = (1L to 2000L).filter { i =>
      val w = (i % 130).toDouble
      hash48Ref(i.toString) < math.floor(Kmv.HashRange.toDouble * math.min(w, 100.0) / 100.0)
    }.toSet
    assert(kept == expect)
    // weight 0 rows can never be sampled; weight >= cap rows always are
    assert(!kept.exists(_ % 130 == 0))
    assert((1L to 2000L).filter(i => i % 130 >= 100 && i % 130 < 130).forall(kept))
  }

  test("weightedBernoulli sample rate tracks the weight in expectation") {
    val n = 20000L
    val rows = (1L to n).map(i => (i, if (i % 2 == 0) 80.0 else 20.0)).toDF("id", "w")
    val kept = Sampling.weightedBernoulli(rows, "id", "w", cap = 100.0)
      .groupBy((col("id") % 2).as("par")).count()
      .as[(Long, Long)].collect().toMap
    val hi = kept(0L).toDouble / (n / 2) // weight 80 -> p = .8
    val lo = kept(1L).toDouble / (n / 2) // weight 20 -> p = .2
    assert(math.abs(hi - 0.8) < 0.02, s"hi rate $hi")
    assert(math.abs(lo - 0.2) < 0.02, s"lo rate $lo")
  }

  test("weightedReservoir equals the driver-side A-ES reference and drops w<=0") {
    val rows = (1L to 500L).map(i =>
      (i, if (i % 7 == 0) 0.0 else (i % 11 + 1).toDouble)).toDF("id", "w")
    val got = Sampling.weightedReservoir(rows, "id", "w", k = 40)
      .select("id").as[Long].collect().toSeq
    val ref = (1L to 500L)
      .map(i => (i, if (i % 7 == 0) 0.0 else (i % 11 + 1).toDouble))
      .filter(_._2 > 0)
      .map { case (i, w) =>
        val u = (hash48Ref(i.toString) + 1).toDouble / Kmv.HashRange.toDouble
        (i, math.pow(u, 1.0 / w))
      }
      .sortBy { case (i, p) => (-p, i) }
      .take(40).map(_._1)
    assert(got == ref)
    assert(!got.exists(_ % 7 == 0), "w=0 rows must never be drawn")
  }

  test("weightedReservoir favors heavy weights") {
    val rows = (1L to 1000L).map(i => (i, if (i <= 50) 1000.0 else 1.0)).toDF("id", "w")
    val got = Sampling.weightedReservoir(rows, "id", "w", k = 50)
      .select("id").as[Long].collect()
    assert(got.count(_ <= 50) >= 40, s"heavy rows drawn: ${got.count(_ <= 50)}/50")
  }

  // ------------------------------------------ R154 bootstrap CI

  test("bootstrap CI: exact replay of the hash-driven resamples") {
    val vals = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L, 100L)
    val rows = vals.zipWithIndex.map { case (v, i) => ("g", v, i + 1L) }
      .toDF("grp", "v", "id")
    val got = Sampling.bootstrapMeanCI(rows, "grp", col("v"), col("id"),
        b = 8, loPpm = 125000L, hiPpm = 875000L)
      .as[(String, Long, Long, Long, Long)].collect().head
    // positions sorted by (v, id) = vals ascending; replay the draws
    val sortedVals = vals.sorted
    val means = (1 to 8).map { b =>
      val draws = (1 to 10).map { j =>
        val idx = hash48Ref(s"g:$b:$j") % 10
        sortedVals(idx.toInt)
      }
      draws.sum / 10
    }.sorted
    assert(got == (("g", 10L, vals.sum / 10, means.head, means(6))))
  }

  test("bootstrap CI: constant data collapses the interval to the mean") {
    val rows = (1L to 30L).map(i => ("c", 7L, i)).toDF("grp", "v", "id")
    val got = Sampling.bootstrapMeanCI(rows, "grp", col("v"), col("id"),
        b = 10, loPpm = 25000L, hiPpm = 975000L)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got == (("c", 30L, 7L, 7L, 7L)))
  }

  // ------------------------------------------ R153 weighted bottom-k

  test("weighted bottom-k: priorities are exactly hash48 div w") {
    val rows = (1L to 200L).map(i => (i, 1L + (i % 7))).toDF("id", "w")
    val got = Sampling.weightedBottomK(rows, "id", col("w"), k = 200)
      .select("id", "w", "priority").as[(Long, Long, Long)]
      .collect().toSeq
    got.foreach { case (id, w, p) =>
      assert(p == hash48Ref(id.toString) / w, s"id=$id")
    }
    // and the k winners are the reference bottom-k under (priority, id)
    val ref = (1L to 200L).map(i => (hash48Ref(i.toString) / (1 + i % 7), i))
      .sorted.take(200).map(_._2).toSet
    assert(got.map(_._1).toSet == ref)
  }

  test("weighted bottom-k: heavy rows dominate, nonpositive weights drop") {
    val rows = (1L to 1000L)
      .map(i => (i, if (i <= 50) 1000L else if (i <= 60) 0L else 1L))
      .toDF("id", "w")
    val got = Sampling.weightedBottomK(rows, "id", col("w"), k = 50)
      .select("id").as[Long].collect()
    assert(got.count(_ <= 50) >= 40, s"heavy rows drawn: ${got.count(_ <= 50)}/50")
    assert(!got.exists(i => i > 50 && i <= 60), "w <= 0 rows never sampled")
  }
}
