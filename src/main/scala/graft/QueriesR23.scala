package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{DeltaLog, Tables}

/** Round-13 surface growth, per the r12 verdict's ranked gaps: the
  * lake-target CDC apply (C36→F14o composite — the reference's own
  * delta→merge→watermark loop pointed at a Delta table, producing
  * engine-recorded UPDATE pre/post images in the change feed), plus
  * the Iceberg next-tier (partition-spec evolution on read, write-to-
  * branch) and the streaming LSH index maintenance composite. House
  * contract as everywhere: deterministic fixtures, every gate a
  * bit-exact hash compare against DuckDB on the same parquet tables.
  */
object QueriesR23 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val tableBuildMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), String]()

  // ---------------------------------------------------------------
  // F14o (r13): CDC replication INTO a Delta table — two
  // Pipeline.replicateDelta runs (bootstrap create + incremental
  // MERGE) against a deterministic orders-derived change script; the
  // gate reads BOTH the recorded change feed (v0's derived inserts,
  // v1's engine-recorded update pre/post images + inserts) and the
  // final replica state from the table the engine wrote.
  // ---------------------------------------------------------------

  private def buildCdcDeltaApply(s: SparkSession, dir: String): String =
    tableBuildMemo.computeIfAbsent(
      (s.sparkContext.applicationId, dir, "cdc_delta_apply"), _ => {
        import graft.cdc.Pipeline
        val root = java.nio.file.Files.createTempDirectory("cdc_delta_apply")
        val orders = t(s, dir, "orders").select(
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"),
          (col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long").as("cents"),
          col("o_orderdate").cast("timestamp").as("__odate"))
        val cutoff = lit("2000-01-01 00:00:00").cast("timestamp")
        // run 1 (bootstrap): the pre-2000 population, all live
        val src1 = orders.filter(col("__odate") < cutoff).select(
          col("o_orderkey"), col("o_orderstatus"), col("cents"),
          col("__odate").as("created_at"),
          lit(null).cast("timestamp").as("updated_at"),
          lit("N").as("is_deleted"))
        val spec = Seq(Pipeline.TableSpec("orders_rep", Seq("o_orderkey")))
        val (r1, wm1) = Pipeline.replicateDelta(s, spec, Nil,
          _ => src1, root.toString, Map.empty)
        require(r1.processed == 1 && r1.failed == 0,
          s"bootstrap run failed: ${r1.results}")
        // run 2 (incremental): every 3rd key updated (+1000, every
        // 37th a soft delete), post-2000 keys inserted (every 41st a
        // source-side tombstone the insert guard must drop); the
        // untouched run-1 rows ride along and the watermark must
        // filter them out
        val touch = lit("2005-06-01 00:00:00").cast("timestamp")
        val upd = src1.filter(col("o_orderkey") % 3 === 0).select(
          col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("cents") + 100000L).as("cents"),
          col("created_at"), touch.as("updated_at"),
          when(col("o_orderkey") % 37 === 0, "Y").otherwise("N")
            .as("is_deleted"))
        val ins = orders.filter(col("__odate") >= cutoff).select(
          col("o_orderkey"), col("o_orderstatus"), col("cents"),
          touch.as("created_at"),
          lit(null).cast("timestamp").as("updated_at"),
          when(col("o_orderkey") % 41 === 0, "Y").otherwise("N")
            .as("is_deleted"))
        val src2 = src1.unionByName(upd).unionByName(ins)
        val (r2, _) = Pipeline.replicateDelta(s, spec, Nil,
          _ => src2, root.toString, wm1)
        require(r2.processed == 1 && r2.failed == 0,
          s"incremental run failed: ${r2.results}")
        val tbl = s"$root/orders_rep"
        require(DeltaLog.state(s, tbl).version == 1L,
          "two runs must land exactly two commits (create + merge)")
        tbl
      })

  /** F14o (r13): the lake-target CDC apply end-to-end — the recorded
    * change feed of the engine's own two commits (v0 derived inserts,
    * v1 recorded update pre/post images + filtered inserts) UNIONED
    * with the final replica state (`_change_type = 'final'`). The
    * oracle replays the same change script in plain SQL; a merge that
    * drops a tombstone wrong, inserts a dead key, skips an image, or
    * rewrites an untouched row hash-fails.
    */
  def cdcDeltaApply(s: SparkSession, dir: String): DataFrame = {
    val tbl = buildCdcDeltaApply(s, dir)
    val payload = Seq("o_orderkey", "o_orderstatus", "cents", "is_deleted")
    val feed = DeltaLog.tableChangesCdf(s, tbl, -1L, 1L)
      .select((payload :+ "_change_type" :+ "_commit_version").map(col): _*)
    val fin = DeltaLog.read(s, tbl)
      .select(payload.map(col): _*)
      .withColumn("_change_type", lit("final"))
      .withColumn("_commit_version", lit(9L))
    feed.unionByName(fin)
      .orderBy(col("_commit_version"), col("_change_type"),
        col("o_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_delta_apply" -> (cdcDeltaApply _))

  val sql: Map[String, String] = Map(
    // t1 = bootstrap population; upd = the staged update script;
    // ins = the post-2000 inserts minus source tombstones. The final
    // state is t1 overridden by upd plus live ins — soft deletes stay
    // as flagged rows, exactly the replica contract.
    "cdc_delta_apply" ->
      """WITH t1 AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderstatus AS st,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |), upd AS (
        |  SELECT k, 'U' AS st, cents + 100000 AS cents,
        |    CASE WHEN k % 37 = 0 THEN 'Y' ELSE 'N' END AS isd
        |  FROM t1 WHERE k % 3 = 0
        |), ins AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderstatus AS st,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |    AND o_orderkey % 41 <> 0
        |)
        |SELECT k AS o_orderkey, st AS o_orderstatus, cents,
        |  'N' AS is_deleted, 'insert' AS _change_type,
        |  CAST(0 AS BIGINT) AS _commit_version FROM t1
        |UNION ALL
        |SELECT k, st, cents, 'N', 'update_preimage', 1 FROM t1 WHERE k % 3 = 0
        |UNION ALL
        |SELECT k, st, cents, isd, 'update_postimage', 1 FROM upd
        |UNION ALL
        |SELECT k, st, cents, 'N', 'insert', 1 FROM ins
        |UNION ALL
        |SELECT COALESCE(u.k, t.k), COALESCE(u.st, t.st),
        |  COALESCE(u.cents, t.cents), COALESCE(u.isd, 'N'), 'final', 9
        |FROM t1 t LEFT JOIN upd u ON u.k = t.k
        |UNION ALL
        |SELECT k, st, cents, 'N', 'final', 9 FROM ins
        |ORDER BY _commit_version, _change_type, o_orderkey""".stripMargin)
}
