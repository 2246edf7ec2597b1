package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Oracle: Spark's own single-partition NTILE over the same total order. */
  private def oracle(df: org.apache.spark.sql.DataFrame, group: Seq[String],
                     value: String, tie: String, n: Int) = {
    val w = Window.partitionBy(group.map(col): _*)
      .orderBy(col(value), col(tie))
    df.withColumn("want", ntile(n).over(w).cast("long"))
  }

  private def check(rows: Seq[(String, Long, Long)], group: Seq[String],
                    n: Int, buckets: Int = 4096): Unit = {
    val df = rows.toDF("g", "v", "id")
    val got = Ranking.ntileExact(df, group, col("v"), Seq(col("id")), n,
      "got", buckets)
    val both = got.join(oracle(df, group, "v", "id", n),
      Seq("g", "v", "id"))
    assert(both.filter(col("got") =!= col("want")).isEmpty,
      both.orderBy("g", "v", "id").collect().mkString("\n"))
  }

  test("matches SQL NTILE globally, N not divisible by n") {
    val rows = (1L to 10L).map(i => ("x", (i * 37) % 11, i))
    check(rows, Seq.empty, 4) // sizes must be 3,3,2,2
    check(rows, Seq.empty, 3)
  }

  test("matches SQL NTILE per group with heavy value ties") {
    val rows = (1L to 200L).map(i => (s"g${i % 3}", i % 4, i))
    check(rows, Seq("g"), 5)
  }

  test("N < n degenerates to rank, like SQL NTILE") {
    check(Seq(("x", 5L, 1L), ("x", 2L, 2L), ("x", 9L, 3L)), Seq.empty, 10)
  }

  test("single distinct value: one range bucket, still exact") {
    val rows = (1L to 50L).map(i => ("x", 7L, i))
    check(rows, Seq.empty, 5)
  }

  test("bucket budget of 1 (all rows one bucket) stays exact") {
    val rows = (1L to 30L).map(i => ("x", (i * 13) % 17, i))
    check(rows, Seq.empty, 4, buckets = 1)
  }

  test("negative and wide-range values bucket correctly") {
    val rows = (1L to 40L).map(i =>
      ("x", (if (i % 2 == 0) -1L else 1L) * i * 1000000007L, i))
    check(rows, Seq.empty, 6)
  }

  test("rankExact produces the exact global rank") {
    val df = (1L to 100L).map(i => ((i * 31) % 101, i)).toDF("v", "id")
    val got = Ranking.rankExact(df, Seq.empty, col("v"), Seq(col("id")),
        "rank").drop("__total")
    val want = df.withColumn("want",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    assert(got.join(want, Seq("v", "id"))
      .filter(col("rank") =!= col("want")).isEmpty)
  }

  test("the only unpartitioned window runs over bucket counts, not data") {
    val df = (1L to 100L).map(i => (i % 7, i)).toDF("v", "id")
    val plan = Ranking.ntileExact(df, Seq.empty, col("v"), Seq(col("id")),
      4, "b").queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val unpartitioned = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(unpartitioned.nonEmpty)
    unpartitioned.foreach { w =>
      // its input must be the per-bucket aggregate (metadata), not rows
      assert(w.child.collectFirst {
        case a: Aggregate if a.groupingExpressions.exists(
          _.toString.contains("__bkt")) => a }.nonEmpty,
        s"unpartitioned window must consume bucket counts:\n$w")
    }
  }

  // --------------------------------------------------------- R152 RRF

  private def runRrf(lists: Seq[Seq[(Long, Long, Long)]], topN: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val dfs = lists.map(_.toDF("query_id", "cand_id", "rnk"))
    Ranking.rrfFuse(dfs, k = 60L, topN = topN)
      .orderBy(col("query_id"), col("rnk"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
  }

  test("RRF: consensus beats a single strong vote, per-term floors") {
    val l1 = Seq((9L, 1L, 1L), (9L, 2L, 2L))
    val l2 = Seq((9L, 2L, 1L), (9L, 3L, 2L))
    val got = runRrf(Seq(l1, l2), 5)
    // c2: 1e6//62 + 1e6//61 = 16129 + 16393 = 32522 (two lists)
    // c1: 1e6//61 = 16393; c3: 1e6//62 = 16129
    assert(got == Seq((9L, 2L, 32522L, 2L, 1L), (9L, 1L, 16393L, 1L, 2L),
      (9L, 3L, 16129L, 1L, 3L)))
  }

  test("RRF: score ties break on cand_id; topN truncates the fused list") {
    val l1 = Seq((1L, 7L, 1L))
    val l2 = Seq((1L, 3L, 1L))
    val got = runRrf(Seq(l1, l2), 1)
    assert(got == Seq((1L, 3L, 16393L, 1L, 1L)), "tie -> lower cand wins")
  }
}
