package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.layout.{FileManifest, ZOrder}
import graft.sources.Tables

/** Round-4 continuation batch y: the r5+ queue — k-core/k-truss HIERARCHY
  * labeling (coreness R94, trussness R95), incremental Z-order/manifest
  * maintenance (F11), and the streaming k-anonymity monitor (X24).
  * Oracle discipline as everywhere: DuckDB SQL on the same parquet,
  * integer-exact, columns aliased identically on both sides.
  */
object QueriesR9 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** R94: coreness labeling over the co-purchase graph (see
    * [[graft.operators.Graph.coreness]]) — every product's k-core level
    * in one nested peel sweep (levels 2..4, 3 rounds each), instead of
    * re-running the single-k peel per candidate k.
    */
  def graphCoreness(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.coreness(
        QueriesR6.coPurchasePairs(s, dir).select(col("src"), col("dst")),
        maxK = 4, roundsPerLevel = 3)
      .orderBy(col("node"))

  /** R95: trussness labeling (see [[graft.operators.Graph.trussness]]) —
    * per-EDGE corroboration level of the co-purchase graph (levels 3..4,
    * 2 support rounds each); bridges stay at 2, triangle-reinforced
    * edges stratify upward.
    */
  def graphTrussness(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.trussness(
        QueriesR6.coPurchasePairs(s, dir).select(col("src"), col("dst")),
        maxK = 4, roundsPerLevel = 2)
      .orderBy(col("a"), col("b"))

  /** F11: incremental Z-order maintenance — base written clustered with
    * a committed manifest version, a delta appended as fresh z-sorted
    * files ([[ZOrder.appendClustered]]), the manifest extended from a
    * DELTA-ONLY scan ([[FileManifest.buildFiles]] + appendVersion), then
    * a 2-D box-pruned scan over the merged manifest. The gate pins the
    * no-false-negative contract end-to-end: pruned scan over base+delta
    * ≡ a plain filter over the whole table. IncrementalLayoutSpec pins
    * the pruning effect and the version history.
    */
  def zorderIncremental(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val base = e.filter(col("event_id") % 10 =!= 0)
    val delta = e.filter(col("event_id") % 10 === 0)
    val store = java.nio.file.Files
      .createTempDirectory("graft_zinc").toString
    val dataDir = s"$store/data"
    val root = s"$store/manifest"
    val z = ZOrder.zvalue(pmod(col("user_id"), lit(4096)),
      pmod(col("event_id"), lit(4096)), 12)
    ZOrder.writeClustered(base, dataDir, z, 8)
    FileManifest.commitVersion(
      FileManifest.build(s, dataDir, Seq("user_id", "event_id"), Nil), root)
    val newFiles = ZOrder.appendClustered(delta, dataDir, z, 2)
    FileManifest.appendVersion(s, root,
      FileManifest.buildFiles(s, newFiles, Seq("user_id", "event_id"), Nil))
    val (_, _, scanned) = FileManifest.prunedScan(s, dataDir,
      FileManifest.readVersion(s, root),
      ranges = Map("user_id" -> (2L, 9L), "event_id" -> (100L, 700L)),
      equalities = Map.empty)
    scanned.select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** X24: streaming k-anonymity monitor (see
    * [[graft.streaming.Streams.streamingKAnonymity]]) — Q3's risk report
    * maintained from per-(type, day) distinct-user state; shares Q3's
    * oracle.
    */
  def streamKAnonymity(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"),
      col("user_id"))
    graft.streaming.Streams.streamingKAnonymity(s, e, k = 5,
        queryName = s"gate_skanon_${System.nanoTime()}")
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- oracle

  /** Straight-line nested coreness peel: levels 2..4 over the
    * co-purchase graph, each level 3 unrolled rounds of (degree-k
    * survivor set, both-endpoint restriction) starting from the previous
    * level's residue; coreness = max level whose residue contains the
    * node. Same fixed-round contract as `graph_kcore`.
    */
  private val corenessSql = {
    // AS MATERIALIZED: each CTE is referenced ~3× by the next round, so
    // default inlining expands the 9-round chain 3^9-fold (and re-opens
    // the parquet per copy — fd exhaustion, not just slowness)
    def level(k: Int, prev: String): String =
      (1 to 3).map { r =>
        val p = if (r == 1) prev else s"l${k}e${r - 1}"
        s"""l${k}k$r AS MATERIALIZED (
           |  SELECT src FROM $p GROUP BY src HAVING COUNT(*) >= $k),
           |l${k}e$r AS MATERIALIZED (
           |  SELECT e.src, e.dst FROM $p e
           |  JOIN l${k}k$r x ON e.src = x.src JOIN l${k}k$r y ON e.dst = y.src
           |)""".stripMargin
      }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |und AS (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |), e0 AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM und
       |  UNION ALL SELECT b, a FROM und
       |),
       |${level(2, "e0")},
       |${level(3, "l2e3")},
       |${level(4, "l3e3")},
       |m AS (
       |  SELECT src AS node, 1 AS lvl FROM e0
       |  UNION ALL SELECT src, 2 FROM l2e3
       |  UNION ALL SELECT src, 3 FROM l3e3
       |  UNION ALL SELECT src, 4 FROM l4e3
       |)
       |SELECT node, CAST(MAX(lvl) AS BIGINT) AS coreness
       |FROM m GROUP BY node ORDER BY node""".stripMargin
  }

  /** Straight-line nested trussness peel: levels 3..4, each 2 unrolled
    * support rounds (common-neighbor count, sup ≥ k−2 filter) from the
    * previous level's residue; trussness = max surviving level, base 2.
    */
  private val trussnessSql = {
    // AS MATERIALIZED for the same inlining-blowup reason as corenessSql
    def level(k: Int, prev: String): String =
      (1 to 2).map { r =>
        val p = if (r == 1) prev else s"t${k}e${r - 1}"
        s"""t${k}d$r AS MATERIALIZED (
           |  SELECT a AS src, b AS dst FROM $p UNION ALL SELECT b, a FROM $p
           |), t${k}s$r AS MATERIALIZED (
           |  SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS sup FROM $p e
           |  JOIN t${k}d$r x ON x.src = e.a
           |  JOIN t${k}d$r y ON y.src = e.b AND y.dst = x.dst
           |  GROUP BY e.a, e.b
           |), t${k}e$r AS MATERIALIZED (
           |  SELECT e.a, e.b FROM $p e
           |  JOIN t${k}s$r s ON s.a = e.a AND s.b = e.b AND s.sup >= ${k - 2}
           |)""".stripMargin
      }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |),
       |${level(3, "e0")},
       |${level(4, "t3e2")},
       |m AS (
       |  SELECT a, b, 2 AS lvl FROM e0
       |  UNION ALL SELECT a, b, 3 FROM t3e2
       |  UNION ALL SELECT a, b, 4 FROM t4e2
       |)
       |SELECT a, b, CAST(MAX(lvl) AS BIGINT) AS trussness
       |FROM m GROUP BY a, b ORDER BY a, b""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "graph_coreness" -> corenessSql,
    "graph_trussness" -> trussnessSql,
    "zorder_incremental" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE user_id BETWEEN 2 AND 9 AND event_id BETWEEN 100 AND 700
        |ORDER BY event_id""".stripMargin,
    "stream_k_anonymity" -> QueriesR7.sql("dq_k_anonymity"))
}
