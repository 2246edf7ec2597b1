package graft.sketches

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class KmvSetOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def report(aVals: Seq[Long], bVals: Seq[Long], k: Int) = {
    val df = (aVals.map(("a", _)) ++ bVals.map(("b", _))).toDF("g", "v")
    Kmv.setOpsReport(df, "g", "v", "a", "b", k).collect().head
  }

  test("degenerate case: below-k sets give EXACT set math") {
    val a = (1L to 30L)
    val b = (21L to 50L)
    val r = report(a, b, k = 64)
    assert(r.getAs[Long]("union_est") == 50L)
    assert(r.getAs[Long]("inter_est") == 10L)
    assert(r.getAs[Long]("exact_union") == 50L)
    assert(r.getAs[Long]("exact_inter") == 10L)
  }

  test("saturated sketches estimate union and intersection within KMV error bounds") {
    // |A| = |B| = 4000, |A∩B| = 2000, union = 6000, jaccard = 1/3
    val a = (1L to 4000L)
    val b = (2001L to 6000L)
    val k = 256
    val r = report(a, b, k)
    val unionEst = r.getAs[Long]("union_est")
    val interEst = r.getAs[Long]("inter_est")
    // KMV rel-error sigma ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert(math.abs(unionEst - 6000.0) / 6000.0 < 0.25, s"union_est $unionEst")
    // intersection compounds jaccard-sampling error (x/k over k samples at
    // rho=1/3: sigma ~ sqrt(rho(1-rho)/k) ~ 2.9% of k) with the union error
    assert(math.abs(interEst - 2000.0) / 2000.0 < 0.35, s"inter_est $interEst")
    assert(r.getAs[Long]("exact_union") == 6000L)
    assert(r.getAs[Long]("exact_inter") == 2000L)
    assert(r.getAs[Long]("n_a") == k && r.getAs[Long]("n_b") == k)
  }

  test("disjoint sets estimate a (near-)zero intersection") {
    val r = report(1L to 3000L, 10001L to 13000L, k = 128)
    val interEst = r.getAs[Long]("inter_est")
    // a few cross-set hash collisions in the merged support are possible in
    // principle; the estimate must stay far from the set sizes
    assert(interEst < 300L, s"inter_est $interEst for disjoint sets")
    assert(r.getAs[Long]("exact_inter") == 0L)
  }

  test("report is insensitive to row duplication (set semantics)") {
    val a = (1L to 500L) ++ (1L to 500L) // duplicates
    val b = (251L to 750L)
    val r = report(a, b, k = 64)
    val r2 = report(a.distinct, b, k = 64)
    assert(r.toSeq == r2.toSeq)
  }
}
