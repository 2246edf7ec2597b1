package graft

import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL front end: after GraftSql.registerAll, the engine is
  * drivable exactly like the warehouse replica it replaces — every lazy
  * gate is a `SELECT * FROM graft_<key>`, and ad-hoc SQL composes the
  * injected native functions over the schema views.
  */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  // a cross-section of the surface: relational, CDC, dedup, text,
  // similarity, multimodal, eval — ≥10 gates driven through spark.sql ONLY
  val names = Seq("q1_pricing_summary", "q_revenue_by_nation", "q_semi_anti",
    "q_window_topk", "q_percentiles", "cdc_prepare", "cdc_latest_per_key",
    "dedup_exact", "text_tokens", "text_quality", "ann_bruteforce_topk",
    "mm_content_sniff", "q_eval_auc", "q_rfm_segmentation")

  test("each gate view answers SELECT * identically to the library call") {
    GraftSql.registerTables(spark, dir)
    GraftSql.registerViews(spark, dir, names)
    for (n <- names) {
      val viaSql = spark.sql(s"SELECT * FROM graft_$n").collect().toSeq
      val direct = SparkEntry.queries(n)(spark, dir).collect().toSeq
      assert(viaSql.map(_.toString).sorted == direct.map(_.toString).sorted,
        s"SQL view graft_$n diverges from the library result")
    }
  }

  test("every lazy gate registers (plans build without driver-side work)") {
    val views = GraftSql.registerAll(spark, dir)
    assert(views.size >= 180, s"expected the bulk of the surface, got ${views.size}")
  }

  test("ad-hoc SQL composes native functions over the schema views") {
    GraftSql.registerTables(spark, dir)
    // rolling_hash + char_shingles from GraftExtensions, plain SQL only
    val row = spark.sql(
      """SELECT COUNT(*) AS n, COUNT(DISTINCT rolling_hash(text)) AS d,
        |       SUM(size(char_shingles(text, 5))) AS s
        |FROM documents WHERE length(text) >= 5""".stripMargin)
      .collect().head
    assert(row.getLong(0) > 0 && row.getLong(1) > 0 && row.getLong(2) > 0)
    // content_type dispatch over binary payloads, still SQL-only
    val kinds = spark.sql(
      """SELECT content_type(encode(text, 'UTF-8')) AS t, COUNT(*) AS n
        |FROM documents GROUP BY 1""".stripMargin)
    assert(kinds.count() >= 1)
  }
}
