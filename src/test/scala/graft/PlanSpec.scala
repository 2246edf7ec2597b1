package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the properties that matter at 100 TB, checked on
  * the actual optimized plans (not just "it returned rows").
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()

  test("q1: column pruning + predicate pushdown reach the parquet scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("q1_pricing_summary")(spark, dir)
    // sparkPlan (pre-AQE) exposes the scan node directly
    val scan = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f }.head
    assert(scan.metadata("PushedFilters").contains("LessThanOrEqual(l_shipdate"),
      "shipdate filter must be pushed to the scan")
    val readCols = scan.output.map(_.name).toSet
    assert(readCols == Set("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
      s"scan must prune to needed columns, read: $readCols")
  }

  test("star join broadcasts every dimension side") {
    val plan = planOf("q_revenue_by_nation")
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "no shuffle join should survive for the dimension chain at this size")
  }

  test("semi/anti joins plan as join types, not subquery re-scans") {
    val plan = planOf("q_semi_anti")
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"))
  }

  test("embedding similarity uses the codegen'd native dot product") {
    val plan = planOf("ann_bruteforce_topk")
    assert(plan.toLowerCase.contains("vecdot"), "native VecDot expression in plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "query side must broadcast")
  }

  test("whole-stage codegen covers the aggregation pipeline") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, dir)
    df.collect() // materialize THIS plan so AQE finalizes it (count() would plan separately)
    val plan = df.queryExecution.executedPlan.toString()
    // '*(n)' node prefixes mark whole-stage-codegen'd spans in the final plan
    assert(plan.contains("*("), s"expected codegen spans in final plan:\n$plan")
  }

  test("range join plans as a hash equi-join on buckets, not a nested loop") {
    val plan = planOf("q_range_join")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketed band join must not plan a nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }

  test("ngram verification keeps the merge scan out of the join condition") {
    val df = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
    // sparkPlan (pre-AQE): join conditions are fixed before adaptive re-planning
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      assert(!j.condition.exists(_.toString.toLowerCase.contains("sortedintersectcount")),
        "the O(n) verify expression must stay in a post-join projection, " +
          s"not run per probed pair inside the join: ${j.condition}")
    }
  }

  test("image metadata decode stays inside whole-stage codegen") {
    val df = SparkEntry.queries("mm_image_meta")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("*("), s"expected codegen spans:\n$plan")
  }

  test("salted skew agg is a two-phase aggregate (partial then final)") {
    val df = SparkEntry.queries("q_skew_agg")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("HashAggregate"))
    // salt column must not leak into the output
    assert(!df.columns.contains("__salt"))
  }

  test("no gate runs a data-sized single-partition window (bucket totals exempt)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // the former NTILE/global-cumulative offenders, rebuilt on the
    // two-stage rank, plus the round-5 window-bearing gates: any
    // surviving unpartitioned window must consume an aggregate over a
    // compressed domain (range buckets or score tiles — metadata-sized),
    // never raw rows
    for (name <- Seq("q_equidepth_hist", "q_rfm_segmentation",
        "q_quantile_bins", "q_time_split", "q_skyline", "q_eval_gains")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.optimizedPlan
      val unpartitioned = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w }
      unpartitioned.foreach { w =>
        assert(w.child.collectFirst {
          case a: Aggregate if a.groupingExpressions.exists(g =>
            g.toString.contains("__bkt") || g.toString.contains("tile")) => a
        }.nonEmpty,
          s"$name: unpartitioned window over non-bucket input:\n$w")
      }
    }
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    import org.apache.spark.sql.functions._
    // production thresholds (10 GB probe-side scan) are sized for clusters;
    // lower them so the optimizer exercises the same rewrite locally
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    val li = graft.sources.Tables.load(s, dir, "lineitem")
    val o = graft.sources.Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.optimizedPlan.toString()
    assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
      s"expected a runtime bloom filter on the fact side:\n$plan")
    assert(joined.count() >= 1) // and it still computes
  }
}
