package graft

import graft.cdc.{Cdc, TopoSort, Watermarks}
import graft.operators.AsOfJoin
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The query catalog: one entry per SURVEY.md §2 capability, each with a
  * DuckDB-equivalent oracle SQL string (built to hash-match bit-for-bit:
  * exact decimal math for money sums, md5-only cross-engine hashing,
  * integer/string outputs for anything order-sensitive, full-tiebreak
  * ORDER BY everywhere).
  */
object Queries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Money/measure columns as exact decimals (sums are then exact in both
    * engines; one final cast to double is deterministic).
    */
  private def d12(c: Column): Column = c.cast(DecimalType(12, 2))
  private def d4(c: Column): Column = c.cast(DecimalType(4, 2))
  private[graft] def ts(c: Column): Column = c.cast("timestamp")
  private[graft] def fmtTs(c: Column): Column = date_format(ts(c), "yyyy-MM-dd HH:mm:ss")

  // ───────────────────────── §2.2 relational / OLAP ─────────────────────────

  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(ts(col("l_shipdate")) <= lit("2001-09-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(d12(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(d12(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(d12(col("l_extendedprice")) * (lit(1) - d4(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(d12(col("l_extendedprice")) *
          ((lit(1) - d4(col("l_discount"))) * (lit(1) + d4(col("l_tax")))))
          .cast("double").as("sum_charge"),
        (sum(d12(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def qRevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
    val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(d12(col("l_extendedprice")) * (lit(1) - d4(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
    def side(how: String, label: String) =
      c.join(o, col("c_custkey") === col("o_custkey"), how)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .withColumn("bucket", lit(label))
        .select(col("c_mktsegment"), col("bucket"), col("n_customers"))
    side("left_semi", "with_orders").unionByName(side("left_anti", "without_orders"))
      .orderBy(col("c_mktsegment"), col("bucket"))
  }

  def qWindowTopK(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("o_custkey"), col("rnk"))
  }

  def qRunningTotal(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").filter(col("user_id") < 20)
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(
        col("user_id"), col("event_id"),
        sum(d12(col("value"))).over(cum).cast("double").as("running_value"),
        count(lit(1)).over(cum).cast("long").as("running_n"),
        lag(col("event_id"), 1).over(w).as("prev_event_id"))
      .orderBy(col("user_id"), col("event_id"))
  }

  def qRollupSales(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(d12(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  def qCubeSales(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(d12(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  /** GROUPING SETS through the engine's SQL surface (the DataFrame API
    * only exposes rollup/cube; arbitrary sets need SQL).
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM graft_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  def qDistinctCounts(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      count(lit(1)).as("n_rows"))
  }

  def qTopOrders(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(ts(col("o_orderdate")), "yyyy-MM-dd").as("order_date"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  def qPivotStatus(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def tot(st: String) = sum(when(col("o_orderstatus") === st, d12(col("o_totalprice")))
      .otherwise(lit(0).cast(DecimalType(12, 2)))).cast("double")
    o.groupBy(col("o_orderpriority"))
      .agg(
        tot("O").as("open_total"), tot("F").as("filled_total"), tot("P").as("pending_total"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).cast("long").as("open_n"))
      .orderBy(col("o_orderpriority"))
  }

  def qJsonExtract(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.groupBy(col("event_type"))
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).cast("long").as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(ts(col("ts"))).as("ts_sec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = e.withColumn("new_session",
      when(col("ts_sec") - lag(col("ts_sec"), 1).over(w) > 1800 ||
        lag(col("ts_sec"), 1).over(w).isNull, 1L).otherwise(0L))
    marked.withColumn("session_seq", sum(col("new_session")).over(cum).cast("long"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        (max(col("ts_sec")) - min(col("ts_sec"))).cast("long").as("duration_sec"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  def qEventBuckets(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.groupBy(
        floor(unix_timestamp(ts(col("ts"))) / 3600).cast("long").as("bucket_hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(d12(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("bucket_hour"), col("event_type"))
  }

  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"))
    AsOfJoin.strictPrior(purchases, clicks, "user_id", "event_id",
        Map("event_id" -> "last_click_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"), col("last_click_id"))
      .orderBy(col("purchase_id"))
  }

  /** R13 via the custom LogicalPlan/Strategy/Exec operator (plans/AsOfJoinPlan);
    * same semantics and oracle as q_asof_join.
    */
  def qAsofJoinNative(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"))
    AsOfJoin.strictPriorNative(purchases, clicks, "user_id", "event_id",
        "event_id", "last_click_id")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("last_click_id"))
      .orderBy(col("purchase_id"))
  }

  def qSampleHash(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // The local fixture is one parquet row group → a 1-task scan, and md5
    // costs ~10µs/row; spread the hash work across cores first. (At real
    // scale the scan has thousands of splits and this repartition is
    // unnecessary — but it's only a 2-column round-robin exchange.)
    li.select(col("l_orderkey"), col("l_linenumber"))
      .repartition(s.sparkContext.defaultParallelism)
      .filter(substring(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))), 1, 2) <= "28")
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Salted two-phase aggregation: identical result to a plain groupBy, but
    * the first phase spreads any hot supplier key over 16 salt buckets so no
    * single reducer drowns at 100 TB. Decimal partials keep it exact.
    */
  def qSkewAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.groupBy(col("l_suppkey"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(16)).as("__salt"))
      .agg(sum(d12(col("l_quantity"))).as("part_qty"), count(lit(1)).as("part_n"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("part_qty")).cast("double").as("sum_qty"),
        sum(col("part_n")).cast("long").as("n"))
      .orderBy(col("l_suppkey"))
  }

  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
    val e = t(s, dir, "events").select(col("user_id").as("k")).distinct()
    def cnt(df: DataFrame, label: String) =
      df.agg(count(lit(1)).as("n")).withColumn("bucket", lit(label))
        .select(col("bucket"), col("n"))
    cnt(o.intersect(e), "both")
      .unionByName(cnt(o.except(e), "orders_only"))
      .unionByName(cnt(e.except(o), "events_only"))
      .orderBy(col("bucket"))
  }

  /** Exact interpolated percentiles. Safe cross-engine because the inputs
    * are small integers and the quantile fractions are dyadic, so the
    * interpolation arithmetic is exact in both engines.
    */
  def qPercentiles(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25_qty"),
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.75)").as("p75_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag"))
  }

  def qStringFuncs(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    p.select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "a", "@").as("name_subst"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        trim(col("p_name")).as("name_trim"))
      .orderBy(col("p_partkey"))
  }

  def qDateFuncs(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val d = ts(col("o_orderdate"))
    o.groupBy(year(d).cast("long").as("order_year"), month(d).cast("long").as("order_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(dayofmonth(d)).cast("long").as("min_day"),
        max(dayofweek(d)).cast("long").as("max_dow"),
        countDistinct(date_trunc("week", d)).as("n_weeks"))
      .orderBy(col("order_year"), col("order_month"))
  }

  // ───────────────────────── §2.1 CDC core ─────────────────────────

  def cdcPrepare(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
    Cdc.withCdcColumns(c, now = lit("2024-06-01 00:00:00").cast("timestamp"))
      .select(col("c_custkey"), col("c_name"),
        fmtTs(col(Cdc.CreatedAt)).as("created_at_s"),
        col(Cdc.UpdatedAt).cast("string").as("updated_at_s"),
        col(Cdc.IsDeleted).as("is_deleted"))
      .orderBy(col("c_custkey"))
  }

  /** Orders with CDC columns derived deterministically (SURVEY §3). */
  private[graft] def ordersWithCdc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      ts(col("o_orderdate")).as("created_at"),
      when(col("o_orderstatus") =!= "O",
        ts(col("o_orderdate")) + expr("INTERVAL '30' DAY")).as("updated_at"))

  def cdcDeltaExtract(s: SparkSession, dir: String): DataFrame = {
    val src = ordersWithCdc(s, dir)
    val chg = Cdc.changeTs(col("created_at"), col("updated_at"))
    Cdc.deltaSince(src, chg, Some(lit("1999-06-01 00:00:00").cast("timestamp")))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        fmtTs(chg).as("change_ts"))
      .orderBy(col("o_orderkey"))
  }

  def cdcLatestPerKey(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
    Cdc.latestPerKey(e, Seq("user_id"), Seq(col("event_id")))
      .orderBy(col("user_id"))
  }

  private def mergeTarget(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(ts(col("o_orderdate")) < lit("2000-01-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").as("total"), lit("N").as("is_deleted"))

  private def mergeStaged(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (d12(col("o_totalprice")) + 1000).cast("double").as("total"),
        when(col("o_orderkey") % 37 === 0, "Y").otherwise("N").as("is_deleted"))

  def cdcMerge(s: SparkSession, dir: String): DataFrame =
    Cdc.mergeSoftDelete(mergeTarget(s, dir), mergeStaged(s, dir), Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))

  def cdcWatermark(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val current = Seq(
      ("click", "2024-01-10 00:00:00"),
      ("view", "2024-01-05 00:00:00"),
      ("signup", "2024-02-20 00:00:00")).toDF("entity", "ts_s")
      .select(col("entity"), col("ts_s").cast("timestamp").as("last_ts"))
    val computed = Watermarks.compute(
      t(s, dir, "events").withColumn("ts", ts(col("ts"))),
      col("event_type"), col("ts"))
    Watermarks.advance(current, computed)
      .select(col("entity"), fmtTs(col("last_ts")).as("last_ts_s"))
      .orderBy(col("entity"))
  }

  def cdcTopoOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TopoSort.levels(Tables.all, Tables.fkEdges)
      .toDF("table_name", "lvl")
      .select(col("table_name"), col("lvl").cast("long").as("load_level"))
      .orderBy(col("load_level"), col("table_name"))
  }

  def fkOrphanCheck(s: SparkSession, dir: String): DataFrame = {
    val checks = (Tables.fkColumns :+ ("events", "user_id", "customer", "c_custkey"))
      .map { case (child, childCol, parent, parentCol) =>
        t(s, dir, child)
          .join(t(s, dir, parent), col(childCol) === col(parentCol), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .withColumn("fk", lit(s"$child->$parent"))
          .select(col("fk"), col("n_orphans"))
      }
    checks.reduce(_ unionByName _).orderBy(col("fk"))
  }

  def statsRowcounts(s: SparkSession, dir: String): DataFrame =
    Tables.all.map { name =>
      t(s, dir, name).agg(count(lit(1)).as("n")).withColumn("table_name", lit(name))
        .select(col("table_name"), col("n"))
    }.reduce(_ unionByName _).orderBy(col("table_name"))

  def cdcScd2(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").filter(col("user_id") < 30)
      .select(col("user_id"), col("event_id"))
    Cdc.scd2(e, Seq("user_id"), Seq(col("event_id")))
      .select(col("user_id"), col("event_id"),
        col("version").cast("long").as("version"), col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  // ─────────────────────── oracle SQL (DuckDB) ───────────────────────

  private val D = "CAST(%s AS DECIMAL(12,2))"
  private def dec(c: String) = D.format(c)

  val sqlRelational: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(${dec("l_quantity")}) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(${dec("l_extendedprice")}) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM(${dec("l_extendedprice")} * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(${dec("l_extendedprice")} * ((1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2))))) AS DOUBLE) AS sum_charge,
         |  CAST(SUM(${dec("l_quantity")}) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_revenue_by_nation" ->
      s"""SELECT r_name, n_name,
         |  CAST(SUM(${dec("l_extendedprice")} * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY r_name, n_name""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_mktsegment, 'with_orders' AS bucket, COUNT(*) AS n_customers
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT c_mktsegment, 'without_orders' AS bucket, COUNT(*) AS n_customers
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment, bucket""".stripMargin,
    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,
    "q_running_total" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER cum AS DOUBLE) AS running_value,
        |  CAST(COUNT(*) OVER cum AS BIGINT) AS running_n,
        |  lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_event_id
        |FROM events WHERE user_id < 20
        |WINDOW cum AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_cube_sales" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(${dec("l_quantity")}) AS DOUBLE) AS sum_qty, COUNT(*) AS n
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(${dec("l_quantity")}) AS DOUBLE) AS sum_qty, COUNT(*) AS n
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_rollup_sales" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(${dec("l_quantity")}) AS DOUBLE) AS sum_qty, COUNT(*) AS n
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_distinct_counts" ->
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  COUNT(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "q_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_pivot_status" ->
      s"""SELECT o_orderpriority,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN ${dec("o_totalprice")} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS open_total,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN ${dec("o_totalprice")} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS filled_total,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN ${dec("o_totalprice")} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS pending_total,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_n
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events
        |), marked AS (
        |  SELECT user_id, event_id, ts_sec,
        |    CASE WHEN ts_sec - lag(ts_sec) OVER w > 1800 OR lag(ts_sec) OVER w IS NULL
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |), sess AS (
        |  SELECT user_id, event_id, ts_sec,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM marked
        |)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
        |  MIN(event_id) AS first_event, MAX(event_id) AS last_event,
        |  CAST(MAX(ts_sec) - MIN(ts_sec) AS BIGINT) AS duration_sec
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q_event_buckets" ->
      """SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) AS bucket_hour, event_type,
        |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_hour, event_type""".stripMargin,
    "q_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  (SELECT MAX(c.event_id) FROM events c
        |    WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.event_id < p.event_id) AS last_click_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,
    "q_asof_join_native" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  (SELECT MAX(c.event_id) FROM events c
        |    WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.event_id < p.event_id) AS last_click_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,
    "q_sample_hash" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE substr(md5(concat(l_orderkey, '-', l_linenumber)), 1, 2) <= '28'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_skew_agg" ->
      s"""SELECT l_suppkey, CAST(SUM(${dec("l_quantity")}) AS DOUBLE) AS sum_qty,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25_qty,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.75) AS p75_qty,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  lower(p_brand) AS brand_lower,
        |  substr(p_type, 1, 5) AS type_prefix,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  p_brand || '/' || p_type AS brand_type,
        |  regexp_replace(p_name, 'a', '@', 'g') AS name_subst,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        |  trim(p_name) AS name_trim
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
        |  COUNT(*) AS n_orders,
        |  CAST(MIN(dayofmonth(o_orderdate)) AS BIGINT) AS min_day,
        |  CAST(MAX(dayofweek(o_orderdate) + 1) AS BIGINT) AS max_dow,
        |  CAST(COUNT(DISTINCT date_trunc('week', o_orderdate)) AS BIGINT) AS n_weeks
        |FROM orders
        |GROUP BY 1, 2 ORDER BY order_year, order_month""".stripMargin,
    "q_set_ops" ->
      """SELECT 'both' AS bucket, COUNT(*) AS n FROM
        |  (SELECT DISTINCT o_custkey FROM orders INTERSECT SELECT DISTINCT user_id FROM events) t
        |UNION ALL
        |SELECT 'orders_only' AS bucket, COUNT(*) AS n FROM
        |  (SELECT DISTINCT o_custkey FROM orders EXCEPT SELECT DISTINCT user_id FROM events) t
        |UNION ALL
        |SELECT 'events_only' AS bucket, COUNT(*) AS n FROM
        |  (SELECT DISTINCT user_id FROM events EXCEPT SELECT DISTINCT o_custkey FROM orders) t
        |ORDER BY bucket""".stripMargin)

  val sqlCdc: Map[String, String] = Map(
    "cdc_prepare" ->
      """SELECT c_custkey, c_name, '2024-06-01 00:00:00' AS created_at_s,
        |  CAST(NULL AS VARCHAR) AS updated_at_s, 'N' AS is_deleted
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "cdc_delta_extract" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    o_orderdate AS created_at,
        |    CASE WHEN o_orderstatus <> 'O' THEN o_orderdate + INTERVAL 30 DAY END AS updated_at
        |  FROM orders)
        |SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(GREATEST(COALESCE(updated_at, created_at), created_at), '%Y-%m-%d %H:%M:%S') AS change_ts
        |FROM src
        |WHERE GREATEST(COALESCE(updated_at, created_at), created_at) > TIMESTAMP '1999-06-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,
    "cdc_latest_per_key" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "cdc_merge" ->
      """WITH target AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice AS total, 'N' AS is_deleted
        |  FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |), staged AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 1000 AS DOUBLE) AS total,
        |    CASE WHEN o_orderkey % 37 = 0 THEN 'Y' ELSE 'N' END AS is_deleted
        |  FROM orders WHERE o_orderkey % 3 = 0
        |)
        |SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.total ELSE t.total END AS total,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.is_deleted ELSE t.is_deleted END AS is_deleted
        |FROM target t FULL JOIN staged s ON t.o_orderkey = s.o_orderkey
        |WHERE t.o_orderkey IS NOT NULL OR s.is_deleted = 'N'
        |ORDER BY o_orderkey""".stripMargin,
    "cdc_watermark" ->
      """WITH cur(entity, last_ts) AS (VALUES
        |  ('click', TIMESTAMP '2024-01-10 00:00:00'),
        |  ('view', TIMESTAMP '2024-01-05 00:00:00'),
        |  ('signup', TIMESTAMP '2024-02-20 00:00:00')),
        |cmp AS (SELECT event_type AS entity, MAX(ts) AS last_ts FROM events GROUP BY event_type)
        |SELECT COALESCE(c.entity, n.entity) AS entity,
        |  strftime(GREATEST(COALESCE(c.last_ts, n.last_ts), COALESCE(n.last_ts, c.last_ts)), '%Y-%m-%d %H:%M:%S') AS last_ts_s
        |FROM cur c FULL JOIN cmp n ON c.entity = n.entity
        |ORDER BY entity""".stripMargin,
    "cdc_topo_order" ->
      """WITH RECURSIVE edges(parent, child) AS (
        |  SELECT * FROM (VALUES ('region','nation'),('nation','customer'),('nation','supplier'),
        |    ('customer','orders'),('orders','lineitem'),('part','lineitem'),
        |    ('supplier','lineitem'),('customer','events')) v
        |), nodes(tbl) AS (
        |  SELECT * FROM (VALUES ('region'),('nation'),('customer'),('supplier'),('part'),
        |    ('orders'),('lineitem'),('events'),('documents'),('embeddings')) v
        |), lv(tbl, l) AS (
        |  SELECT tbl, 0 FROM nodes WHERE tbl NOT IN (SELECT child FROM edges)
        |  UNION ALL
        |  SELECT e.child, lv.l + 1 FROM lv JOIN edges e ON e.parent = lv.tbl
        |)
        |SELECT tbl AS table_name, CAST(MAX(l) AS BIGINT) AS load_level
        |FROM lv GROUP BY tbl ORDER BY load_level, table_name""".stripMargin,
    "fk_orphan_check" ->
      """SELECT 'customer->nation' AS fk, COUNT(*) AS n_orphans FROM customer WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
        |UNION ALL SELECT 'events->customer', COUNT(*) FROM events WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = user_id)
        |UNION ALL SELECT 'lineitem->orders', COUNT(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL SELECT 'lineitem->part', COUNT(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
        |UNION ALL SELECT 'lineitem->supplier', COUNT(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
        |UNION ALL SELECT 'nation->region', COUNT(*) FROM nation WHERE NOT EXISTS (SELECT 1 FROM region WHERE r_regionkey = n_regionkey)
        |UNION ALL SELECT 'orders->customer', COUNT(*) FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |UNION ALL SELECT 'supplier->nation', COUNT(*) FROM supplier WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = s_nationkey)
        |ORDER BY fk""".stripMargin,
    "stats_rowcounts" ->
      Tables.all.sorted.map(n => s"SELECT '$n' AS table_name, COUNT(*) AS n FROM $n")
        .mkString("", "\nUNION ALL ", "\nORDER BY table_name"),
    "cdc_scd2" ->
      """SELECT user_id, event_id, CAST(version AS BIGINT) AS version, is_current FROM (
        |  SELECT user_id, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS version,
        |    (LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL) AS is_current
        |  FROM events WHERE user_id < 30) t
        |ORDER BY user_id, version""".stripMargin)
}
