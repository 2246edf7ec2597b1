package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 continuation gates (batch r): coherent-unit sampling,
  * seasonality-adjusted monitoring residuals, and the value-skew
  * advisor. Oracle discipline unchanged.
  */
object QueriesR8 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** R89: session-coherent sampling — sample UNITS (whole (user,
    * session) groups), not rows: md5-hash the session key, keep ~1 in 4,
    * then one semi-join pulls every event of the sampled sessions. The
    * pattern for eval-set carving where row sampling would tear
    * trajectories apart; deterministic, so re-runs and engines agree.
    * Sessions are the 30-minute-gap kind the sessionize gate defines.
    */
  def qSessionSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val sess = e
      .withColumn("new_s",
        when(col("ts_sec") - lag(col("ts_sec"), 1).over(w) > 1800 ||
          lag(col("ts_sec"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val keyHash = conv(substring(md5(concat_ws("|",
      col("user_id"), col("session_seq"))), 1, 6), 16, 10).cast("long")
    sess.withColumn("keep", keyHash % 4 === 0)
      .filter(col("keep"))
      .select(col("user_id"), col("session_seq"), col("event_id"),
        col("event_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Q4: seasonality-adjusted residuals — per (type, day), the day's
    * event count against its WEEKDAY's mean for that type, in exact
    * integer cross-multiplied form: residual_scaled = n·D − T (D = days
    * that weekday occurred in the type's span, T = that weekday's total
    * count), so no mean ever becomes a float; breach = deviation beyond
    * 50% of the weekday mean, i.e. |residual_scaled|·2 > T. The Monday
    * dip stops paging the on-call that Q2's unadjusted drift would.
    */
  def qSeasonalResiduals(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"))
    val daily = e.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("weekday", (col("day") + 3) % 7)
    val wk = daily.groupBy(col("event_type"), col("weekday"))
      .agg(sum(col("n")).as("t_total"), count(lit(1)).as("d_days"))
    daily.join(broadcast(wk), Seq("event_type", "weekday"))
      .withColumn("residual_scaled", col("n") * col("d_days") - col("t_total"))
      .withColumn("breach", abs(col("residual_scaled")) * 2 > col("t_total"))
      .select(col("event_type"), col("day"), col("weekday"), col("n"),
        col("residual_scaled"), col("breach"))
      .orderBy(col("event_type"), col("day"))
  }

  /** C30: value-skew advisor — per candidate join/partition key, the
    * heaviest value's share in exact ppm plus group counts: the one
    * number that predicts a shuffle hot spot before it happens (R15's
    * salting and AQE skew-join are the cures; this is the screen).
    */
  def statsValueSkew(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    def skewOf(c: String): DataFrame = {
      val g = li.groupBy(col(c).cast("long").as("v"))
        .agg(count(lit(1)).as("n"))
      g.agg(sum(col("n")).as("n_rows"),
          count(lit(1)).as("n_values"),
          max(col("n")).as("top_count"))
        .withColumn("key_col", lit(c))
        .withColumn("top_share_ppm", expr("top_count * 1000000 div n_rows"))
        .select(col("key_col"), col("n_rows"), col("n_values"),
          col("top_count"), col("top_share_ppm"))
    }
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(skewOf)
      .reduce(_ unionByName _)
      .orderBy(col("key_col"))
  }

  /** R13b: FORWARD as-of join (see [[graft.operators.AsOfJoin.strictNext]])
    * — per click, the user's first strictly-later purchase: the
    * direction the prior-join gates (R13) cannot express.
    */
  def qAsofForward(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"))
    graft.operators.AsOfJoin.strictNext(clicks, purchases, "user_id",
        "event_id", Map("event_id" -> "next_purchase_id"))
      .select(col("event_id").as("click_id"), col("user_id"),
        col("next_purchase_id"))
      .orderBy(col("click_id"))
  }

  /** R90: weighted median — the price cents at which half the shipped
    * QUANTITY sits below, per return flag: weighted nearest-rank (first
    * value whose running weight reaches half the total, cross-multiplied
    * so no half is ever a float). The unweighted median (R17) answers a
    * different question whenever quantity correlates with price.
    */
  def qWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, dir, "lineitem").select(col("l_returnflag"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("cents"),
      col("l_quantity").cast("long").as("qty"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cents"), col("qty"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    li
      .withColumn("cum_qty", sum(col("qty")).over(w))
      .withColumn("total_qty", sum(col("qty")).over(wAll))
      // first row where 2·cum ≥ total: the weighted nearest-rank median
      .filter(col("cum_qty") * 2 >= col("total_qty") &&
        (col("cum_qty") - col("qty")) * 2 < col("total_qty"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("cents")).as("wmedian_cents"),
        max(col("total_qty")).as("total_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** R91: longest streak — per user, the longest run of consecutive
    * same-type events under the (ts, event_id) order: the gaps-and-
    * islands group key (rn − rn_within_type) turns runs into groups in
    * two window passes, then two aggregates. Engagement-streak shape.
    */
  def qLongestStreak(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("event_type"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"))
    val wAll = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val wType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_sec"), col("event_id"))
    e.withColumn("grp",
        row_number().over(wAll) - row_number().over(wType))
      .groupBy(col("user_id"), col("event_type"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        max_by(col("event_type"), struct(col("len"), col("event_type")))
          .as("streak_type"))
      .orderBy(col("user_id"))
  }

  /** R92: week-over-week rank movers — parts whose shipment rank
    * improved most vs the previous week: per-week dense ranks (count
    * desc, part), consecutive weeks self-joined on part, top 20 by
    * (rank gain, week, part). The "what's suddenly hot" report on top
    * of R70's trending counts.
    */
  def qRankMovers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = t(s, dir, "lineitem")
      .select(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 604800000000")
        .as("week"), col("l_partkey"))
      .groupBy(col("week"), col("l_partkey"))
      .agg(count(lit(1)).as("n"))
    val ranked = counts.withColumn("rnk",
      row_number().over(Window.partitionBy(col("week"))
        .orderBy(col("n").desc, col("l_partkey"))).cast("long"))
    val prev = ranked.select((col("week") + 1).as("week"),
      col("l_partkey"), col("rnk").as("prev_rnk"))
    ranked.join(prev, Seq("week", "l_partkey"))
      .withColumn("gain", col("prev_rnk") - col("rnk"))
      .filter(col("gain") > 0)
      .orderBy(col("gain").desc, col("week"), col("l_partkey"))
      .limit(20)
      .select(col("week"), col("l_partkey"), col("prev_rnk"), col("rnk"),
        col("gain"))
  }

  /** M5: video container metadata decode — synthetic ISO-BMFF payloads
    * (ftyp + moov/mvhd, fields derived from doc_id) parsed back by the
    * native box-walk decoder (see [[graft.multimodal.VideoHeader]]);
    * construct→parse identity oracle like mm_image_meta, plus the
    * timescale-normalized duration in integer ms.
    */
  def mmVideoMeta(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
    val be32 = (v: org.apache.spark.sql.Column) => lpad(hex(v.cast("int")), 8, "0")
    val timescale = (lit(1000) + (col("doc_id") % 10) * 100).cast("int")
    val duration = (col("doc_id") % 90000 + 1).cast("int")
    val payload = unhex(concat(
      lit("0000001066747970"), lit("69736f6d"), lit("00000000"), // ftyp isom
      lit("000000246d6f6f76"),                                   // moov, 36
      lit("0000001c6d766864"), lit("00000000"),                  // mvhd v0
      lit("0000000000000000"),                                   // ctime mtime
      be32(timescale), be32(duration)))
    d.withColumn("meta", graft.multimodal.VideoHeader.video_meta(payload))
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.brand").as("brand"),
        col("meta.timescale").cast("long").as("timescale"),
        col("meta.duration").cast("long").as("duration"))
      .withColumn("duration_ms",
        expr("duration * 1000 div timescale"))
      .orderBy(col("doc_id"))
  }

  /** M6: content-type sniffing dispatch — a MIXED binary column (six
    * real magic-number families plus garbage, chosen by doc_id) routed
    * by [[graft.multimodal.Sniff.content_type]] without trusting any
    * recorded extension; 'unknown' is an answer, never null.
    */
  def mmContentSniff(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
    val kind = col("doc_id") % 7
    val payload = unhex(
      when(kind === 0, lit("89504e470d0a1a0a"))
        .when(kind === 1, lit("ffd8ffe0"))
        .when(kind === 2, lit("474946383961"))
        .when(kind === 3, lit("424d0000"))
        .when(kind === 4, lit("524946460000000057415645"))
        .when(kind === 5, lit("000000106674797069736f6d"))
        .otherwise(lit("deadbeef")))
    d.withColumn("ctype", graft.multimodal.Sniff.content_type(payload))
      .select(col("doc_id"), col("ctype"))
      .orderBy(col("doc_id"))
  }

  /** X21: streaming cumulative distinct (see
    * [[graft.streaming.Streams.streamingCumulativeDistinct]]) — R85
    * maintained from a per-user type SET (bounded by |types|); shares
    * R85's oracle.
    */
  def streamCumulativeDistinct(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
      col("event_type"))
    graft.streaming.Streams.streamingCumulativeDistinct(s, e,
        queryName = s"gate_scumdist_${System.nanoTime()}")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("n_types_seen"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** X22: streaming longest streak (see
    * [[graft.streaming.Streams.streamingLongestStreak]]) — R91 from four
    * scalars of per-user state; shares R91's oracle.
    */
  def streamLongestStreak(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
      col("event_type"))
    graft.streaming.Streams.streamingLongestStreak(s, e,
        queryName = s"gate_sstreak_${System.nanoTime()}")
      .select(col("user_id"), col("longest_streak"), col("streak_type"))
      .orderBy(col("user_id"))
  }

  /** C31: golden-record merge — the MDM survivorship rule "latest
    * non-null per attribute" over a key's change history: the value
    * column is nulled for 'error' events (modeling partial updates), and
    * the golden row carries the latest event identity plus the latest
    * NON-NULL value via an IGNORE-NULLS window carry. One window pass +
    * one last-row selection, no per-attribute joins.
    */
  def cdcGoldenRecord(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
        col("event_type"),
        unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
        round(col("value") * 100).cast("long").as("cents0"))
      .withColumn("cents_p",
        when(col("event_type") =!= "error", col("cents0")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    e.withColumn("rn_desc", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec").desc, col("event_id").desc)))
      .withColumn("last_cents", last(col("cents_p"), ignoreNulls = true).over(wAll))
      .withColumn("n_events", count(lit(1)).over(wAll))
      .withColumn("n_missing", sum(when(col("cents_p").isNull, 1L)
        .otherwise(0L)).over(wAll))
      .filter(col("rn_desc") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), col("last_cents"),
        col("n_events"), col("n_missing"))
      .orderBy(col("user_id"))
  }

  /** R93: fixed-round k-truss (see [[graft.operators.Graph.kTruss]]) —
    * the 4-truss of the co-purchase graph after 2 peel rounds: edges in
    * ≥ 2 triangles within the surviving subgraph, support recomputed on
    * the residue.
    */
  def graphKtruss(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.kTruss(
        QueriesR6.coPurchaseEdges(s, dir),
        k = 4, rounds = 2)
      .orderBy(col("a"), col("b"))

  /** X23: streaming golden record (see
    * [[graft.streaming.Streams.streamingGoldenRecord]]) — C31 from O(1)
    * per-user state; shares C31's oracle.
    */
  def streamGoldenRecord(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts").cast("timestamp")).as("ts_sec"),
        col("event_type"),
        when(col("event_type") =!= "error",
          round(col("value") * 100).cast("long")).as("cents_p"))
    graft.streaming.Streams.streamingGoldenRecord(s, e,
        queryName = s"gate_sgolden_${System.nanoTime()}")
      .orderBy(col("user_id"))
  }

  /** T22: BM25 × phrase fusion — the T15 bag-of-words score fused with
    * T18's positional signals in one exact-integer formula: bonus =
    * n_phrase·10⁶ + 10⁶ div (1 + min_dist), zero when the positional
    * pass found nothing. Both component scorers are already gated; the
    * fusion ranks by (total desc, doc_id).
    */
  def textBm25Phrase(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val base = graft.operators.Retrieval.bm25(d, "doc_id", "text",
        QueriesR6.Bm25Vocab, topN = 1000000)
      .select(col("doc_id"), col("score"))
    val prox = graft.operators.Retrieval.phraseProximity(d, "doc_id", "text",
        "window", "scan", topN = 1000000)
    base.join(prox, Seq("doc_id"), "left")
      .withColumn("bonus",
        coalesce(col("n_phrase"), lit(0L)) * 1000000L +
          coalesce(expr("1000000 div (1 + min_dist)"), lit(0L)))
      .withColumn("total", col("score") + col("bonus"))
      .orderBy(col("total").desc, col("doc_id"))
      .limit(200)
      .select(col("doc_id"), col("score"), col("bonus"), col("total"))
  }

  // ---------------------------------------------------------------- oracle

  /** R91's report SQL — shared verbatim by X22 (`stream_longest_streak`). */
  private val longestStreakSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      |  FROM events
      |), m AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts_sec, event_id) -
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts_sec, event_id) AS grp
      |  FROM e
      |), g AS (
      |  SELECT user_id, event_type, grp, CAST(COUNT(*) AS BIGINT) AS len
      |  FROM m GROUP BY 1, 2, 3
      |)
      |SELECT user_id, len AS longest_streak, event_type AS streak_type
      |FROM (
      |  SELECT user_id, event_type, len, row_number() OVER (
      |    PARTITION BY user_id ORDER BY len DESC, event_type DESC) AS rn
      |  FROM g) q
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** C31's report SQL — shared verbatim by X23 (`stream_golden_record`). */
  private val goldenRecordSql =
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |    CASE WHEN event_type <> 'error'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) END AS cents_p
        |  FROM events
        |), g AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_sec DESC, event_id DESC) AS rn_desc,
        |    last_value(cents_p IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts_sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS last_cents,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_events,
        |    SUM(CASE WHEN cents_p IS NULL THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id) AS n_missing
        |  FROM e
        |)
        |SELECT user_id, event_id AS last_event_id,
        |  event_type AS last_event_type, last_cents,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST(n_missing AS BIGINT) AS n_missing
        |FROM g WHERE rn_desc = 1 ORDER BY user_id""".stripMargin

  val sql: Map[String, String] = Map(
    "q_asof_forward" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |  (SELECT MIN(p.event_id) FROM events p
        |   WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        |     AND p.event_id > c.event_id) AS next_purchase_id
        |FROM events c WHERE c.event_type = 'click'
        |ORDER BY click_id""".stripMargin,
    "q_session_sample" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |  FROM events
        |), marked AS (
        |  SELECT user_id, event_id, event_type, ts_sec,
        |    CASE WHEN ts_sec - lag(ts_sec) OVER w > 1800
        |      OR lag(ts_sec) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
        |), sess AS (
        |  SELECT user_id, event_id, event_type,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM marked
        |)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  event_id, event_type
        |FROM sess
        |WHERE CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|' ||
        |    CAST(session_seq AS VARCHAR)), 1, 6)) AS BIGINT) % 4 = 0
        |ORDER BY user_id, event_id""".stripMargin,
    "q_seasonal_residuals" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), d2 AS (
        |  SELECT *, (day + 3) % 7 AS weekday FROM daily
        |), wk AS (
        |  SELECT event_type, weekday, CAST(SUM(n) AS BIGINT) AS t_total,
        |    CAST(COUNT(*) AS BIGINT) AS d_days
        |  FROM d2 GROUP BY 1, 2
        |)
        |SELECT d2.event_type, d2.day, d2.weekday, d2.n,
        |  CAST(d2.n * wk.d_days - wk.t_total AS BIGINT) AS residual_scaled,
        |  (ABS(d2.n * wk.d_days - wk.t_total) * 2 > wk.t_total) AS breach
        |FROM d2 JOIN wk ON wk.event_type = d2.event_type
        |  AND wk.weekday = d2.weekday
        |ORDER BY d2.event_type, d2.day""".stripMargin,
    "stats_value_skew" -> {
      Seq("l_orderkey", "l_partkey", "l_suppkey").map { c =>
        s"""SELECT '$c' AS key_col, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_values,
           |  (SELECT CAST(MAX(n) AS BIGINT) FROM (
           |     SELECT COUNT(*) AS n FROM lineitem GROUP BY $c) g) AS top_count,
           |  (SELECT CAST(MAX(n) AS BIGINT) FROM (
           |     SELECT COUNT(*) AS n FROM lineitem GROUP BY $c) g) * 1000000
           |    // COUNT(*) AS top_share_ppm
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
    },
    "q_weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem
        |), r AS (
        |  SELECT l_returnflag, cents, qty,
        |    SUM(qty) OVER (PARTITION BY l_returnflag ORDER BY cents, qty
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_qty,
        |    SUM(qty) OVER (PARTITION BY l_returnflag) AS total_qty
        |  FROM li
        |)
        |SELECT l_returnflag, CAST(MIN(cents) AS BIGINT) AS wmedian_cents,
        |  CAST(MAX(total_qty) AS BIGINT) AS total_qty
        |FROM r
        |WHERE cum_qty * 2 >= total_qty AND (cum_qty - qty) * 2 < total_qty
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_longest_streak" -> longestStreakSql,
    // X22 shares R91's report and oracle (four-scalar streaming state
    // under the ordered-delivery contract)
    "stream_longest_streak" -> longestStreakSql,
    // X21 shares R85's report and oracle
    "stream_cumulative_distinct" -> QueriesR7.sql("q_cumulative_distinct"),
    // X23 shares C31's report and oracle
    "stream_golden_record" -> goldenRecordSql,
    "q_rank_movers" ->
      """WITH c AS (
        |  SELECT epoch_us(l_shipdate) // 604800000000 AS week, l_partkey,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2
        |), r AS (
        |  SELECT week, l_partkey, n,
        |    CAST(row_number() OVER (PARTITION BY week
        |      ORDER BY n DESC, l_partkey) AS BIGINT) AS rnk
        |  FROM c
        |)
        |SELECT r.week, r.l_partkey, p.rnk AS prev_rnk, r.rnk,
        |  p.rnk - r.rnk AS gain
        |FROM r JOIN r p ON p.week = r.week - 1 AND p.l_partkey = r.l_partkey
        |WHERE p.rnk - r.rnk > 0
        |ORDER BY gain DESC, r.week, r.l_partkey LIMIT 20""".stripMargin,
    "mm_video_meta" ->
      """SELECT doc_id, 'mp4' AS format, 'isom' AS brand,
        |  CAST(1000 + (doc_id % 10) * 100 AS BIGINT) AS timescale,
        |  CAST(doc_id % 90000 + 1 AS BIGINT) AS duration,
        |  CAST((doc_id % 90000 + 1) * 1000 //
        |    (1000 + (doc_id % 10) * 100) AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_content_sniff" ->
      """SELECT doc_id,
        |  CASE doc_id % 7 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |    WHEN 2 THEN 'gif' WHEN 3 THEN 'bmp' WHEN 4 THEN 'wav'
        |    WHEN 5 THEN 'mp4' ELSE 'unknown' END AS ctype
        |FROM documents ORDER BY doc_id""".stripMargin,
    "cdc_golden_record" -> goldenRecordSql,
    "graph_ktruss" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (
        |  SELECT a.l_partkey AS a, b.l_partkey AS b
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2
        |), d0 AS (
        |  SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
        |), s1 AS (
        |  SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS sup FROM e0 e
        |  JOIN d0 x ON x.src = e.a JOIN d0 y ON y.src = e.b AND y.dst = x.dst
        |  GROUP BY e.a, e.b
        |), e1 AS (
        |  SELECT e.a, e.b FROM e0 e
        |  JOIN s1 ON s1.a = e.a AND s1.b = e.b AND s1.sup >= 2
        |), d1 AS (
        |  SELECT a AS src, b AS dst FROM e1 UNION ALL SELECT b, a FROM e1
        |), s2 AS (
        |  SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS sup FROM e1 e
        |  JOIN d1 x ON x.src = e.a JOIN d1 y ON y.src = e.b AND y.dst = x.dst
        |  GROUP BY e.a, e.b
        |), e2 AS (
        |  SELECT e.a, e.b FROM e1 e
        |  JOIN s2 ON s2.a = e.a AND s2.b = e.b AND s2.sup >= 2
        |), d2 AS (
        |  SELECT a AS src, b AS dst FROM e2 UNION ALL SELECT b, a FROM e2
        |), s3 AS (
        |  SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS sup FROM e2 e
        |  JOIN d2 x ON x.src = e.a JOIN d2 y ON y.src = e.b AND y.dst = x.dst
        |  GROUP BY e.a, e.b
        |)
        |SELECT e.a, e.b, COALESCE(s3.sup, 0) AS support
        |FROM e2 e LEFT JOIN s3 ON s3.a = e.a AND s3.b = e.b
        |ORDER BY e.a, e.b""".stripMargin,
    "text_bm25_phrase" ->
      """WITH toks AS (
        |  SELECT doc_id, str_split(text, ' ') AS tk FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks
        |), stats AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(dl) AS BIGINT) AS l_total FROM dl
        |), tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
        |  WHERE term IN ('query', 'window', 'scan')
        |  GROUP BY doc_id, term
        |), dfreq AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
        |), scored AS (
        |  SELECT tf.doc_id,
        |    CAST(CAST(((2 * (s.n_docs - f.df) + 1) * 1000000) // (2 * f.df + 1)
        |        AS HUGEINT) * 44 * tf.tf * s.l_total
        |      // (20 * tf.tf * s.l_total + 6 * s.l_total + 18 * d.dl * s.n_docs)
        |      AS BIGINT) AS term_score
        |  FROM tf JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
        |    CROSS JOIN stats s
        |), agg AS (
        |  SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS score
        |  FROM scored GROUP BY doc_id
        |), tok AS (
        |  SELECT doc_id, unnest(tk) AS term,
        |    unnest(range(1, len(tk) + 1)) AS pos
        |  FROM toks
        |), pa AS (SELECT doc_id, pos AS pa FROM tok WHERE term = 'window'),
        |pb AS (SELECT doc_id, pos AS pb FROM tok WHERE term = 'scan'),
        |prox AS (
        |  SELECT p.doc_id,
        |    CAST(SUM(CASE WHEN pb = pa + 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_phrase,
        |    CAST(MIN(ABS(pb - pa)) AS BIGINT) AS min_dist
        |  FROM pa p JOIN pb q ON p.doc_id = q.doc_id
        |  GROUP BY p.doc_id
        |)
        |SELECT a.doc_id, a.score,
        |  CAST(COALESCE(n_phrase, 0) * 1000000 +
        |    COALESCE(1000000 // (1 + min_dist), 0) AS BIGINT) AS bonus,
        |  CAST(a.score + COALESCE(n_phrase, 0) * 1000000 +
        |    COALESCE(1000000 // (1 + min_dist), 0) AS BIGINT) AS total
        |FROM agg a LEFT JOIN prox ON prox.doc_id = a.doc_id
        |ORDER BY total DESC, a.doc_id LIMIT 200""".stripMargin)
}
