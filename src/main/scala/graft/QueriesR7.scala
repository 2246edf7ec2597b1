package graft

import graft.operators.{Graph, Retrieval}
import graft.sketches.Kmv
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 continuation gates (batch i): the r5+ queue — fixed-round
  * k-core peel, per-day retention curves computed from the streaming
  * day-KMV states alone, and phrase/proximity retrieval (the positional
  * second retrieval gate). Oracle discipline unchanged: integer/decimal
  * algebra only, full-tiebreak ORDER BY, md5-portable hashing.
  */
object QueriesR7 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** R76: 3-core of the co-purchase graph after 4 fixed peel rounds (see
    * [[graft.operators.Graph.kCore]]) — surviving nodes with their
    * degree inside the peeled subgraph.
    */
  def graphKcore(s: SparkSession, dir: String): DataFrame =
    Graph.kCore(QueriesR6.coPurchasePairs(s, dir).select(col("src"), col("dst")),
        k = 3, rounds = 4)
      .orderBy(col("node"))

  /** S11: per-day retention curves from the streaming day-KMV states (see
    * [[graft.sketches.Kmv.retentionFromDaySketches]]) — the drained
    * per-day sketches are the ONLY input; raw events are never re-read.
    * d = 0 rows land on exactly 1 000 000 ppm by the estimator's algebra
    * (built-in calibration).
    */
  def qKmvRetention(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val day = expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
    val act = t(s, dir, "events")
      .select(day.as("day"), Kmv.hash48(col("user_id")).as("h"))
    val daySketches = graft.streaming.Streams.streamingDayKmv(s, act, k,
      queryName = s"gate_skmvret_${System.nanoTime()}")
    Kmv.retentionFromDaySketches(daySketches, k, maxOffset = 6)
      .orderBy(col("day"), col("offset_d"))
  }

  /** T18: phrase + proximity retrieval for the query phrase
    * "window scan" (see [[graft.operators.Retrieval.phraseProximity]]):
    * exact in-order adjacent phrase hits plus minimum token distance,
    * ranked (n_phrase desc, min_dist, doc_id).
    */
  def textPhraseProx(s: SparkSession, dir: String): DataFrame =
    Retrieval.phraseProximity(t(s, dir, "documents"), "doc_id", "text",
      "window", "scan", topN = 200)

  // ---------------------------------------------------------------- oracle

  /** Shared straight-line peel prefix: the co-purchase edge set then 4
    * rounds of (degree ≥ 3 survivor set, both-endpoint restriction).
    */
  private val kcorePeelSql = {
    val rounds = (1 to 4).map { r =>
      s"""k$r AS (SELECT src FROM e${r - 1} GROUP BY src HAVING COUNT(*) >= 3),
         |e$r AS (
         |  SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN k$r x ON e.src = x.src JOIN k$r y ON e.dst = y.src
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |und AS (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |), e0 AS (
       |  SELECT a AS src, b AS dst FROM und
       |  UNION ALL SELECT b, a FROM und
       |),
       |$rounds""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "graph_kcore" ->
      s"""$kcorePeelSql
         |SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg_core
         |FROM e4 GROUP BY src ORDER BY node""".stripMargin,
    "q_kmv_retention" ->
      s"""WITH act AS (
         |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
         |    ${QueriesR3.hex12ToInt("md5(CAST(user_id AS VARCHAR))")} AS h
         |  FROM events
         |), sk AS (
         |  SELECT day, h FROM (
         |    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
         |    FROM act) r
         |  WHERE rn <= 64
         |), days AS (SELECT DISTINCT day FROM sk),
         |pairs AS (
         |  SELECT d.day, o.offset_d, d.day + o.offset_d AS target_day
         |  FROM days d
         |  CROSS JOIN (SELECT unnest(range(0, 7)) AS offset_d) o
         |  JOIN days t ON t.day = d.day + o.offset_d
         |), u AS (
         |  SELECT p.day, p.offset_d, s.h,
         |    MAX(CASE WHEN s.day = p.day THEN 1 ELSE 0 END) AS in_a,
         |    MAX(CASE WHEN s.day = p.target_day THEN 1 ELSE 0 END) AS in_b
         |  FROM pairs p JOIN sk s ON s.day IN (p.day, p.target_day)
         |  GROUP BY p.day, p.offset_d, s.h
         |), mm AS (
         |  SELECT day, offset_d,
         |    CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(MAX(h) AS BIGINT) AS theta,
         |    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x_common
         |  FROM (SELECT day, offset_d, h, in_a, in_b,
         |          row_number() OVER (PARTITION BY day, offset_d ORDER BY h) AS rn
         |        FROM u) q
         |  WHERE rn <= 64
         |  GROUP BY day, offset_d
         |), aa AS (
         |  SELECT day, CAST(COUNT(*) AS BIGINT) AS m_a,
         |    CAST(MAX(h) AS BIGINT) AS theta_a
         |  FROM sk GROUP BY day
         |), est AS (
         |  SELECT mm.day, mm.offset_d, mm.m, mm.x_common,
         |    CASE WHEN aa.m_a < 64 THEN aa.m_a
         |      ELSE ${63L * Kmv.HashRange} // aa.theta_a END AS cohort_est,
         |    CASE WHEN mm.m < 64 THEN mm.m
         |      ELSE ${63L * Kmv.HashRange} // mm.theta END AS union_est
         |  FROM mm JOIN aa ON aa.day = mm.day
         |), f AS (
         |  SELECT day, offset_d, cohort_est,
         |    CASE WHEN m < 64 THEN x_common
         |      ELSE (x_common * union_est) // 64 END AS inter_est
         |  FROM est
         |)
         |SELECT day, CAST(offset_d AS BIGINT) AS offset_d, cohort_est,
         |  inter_est,
         |  CAST(CAST(inter_est AS HUGEINT) * 1000000 // cohort_est
         |    AS BIGINT) AS ret_ppm
         |FROM f ORDER BY day, offset_d""".stripMargin,
    "text_phrase_prox" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(toks) AS term,
        |    unnest(range(1, len(toks) + 1)) AS pos
        |  FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents) d
        |), pa AS (SELECT doc_id, pos AS pa FROM tok WHERE term = 'window'),
        |pb AS (SELECT doc_id, pos AS pb FROM tok WHERE term = 'scan')
        |SELECT p.doc_id,
        |  CAST(SUM(CASE WHEN pb = pa + 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_phrase,
        |  CAST(MIN(ABS(pb - pa)) AS BIGINT) AS min_dist
        |FROM pa p JOIN pb q ON p.doc_id = q.doc_id
        |GROUP BY p.doc_id
        |ORDER BY n_phrase DESC, min_dist, p.doc_id LIMIT 200""".stripMargin)
}
