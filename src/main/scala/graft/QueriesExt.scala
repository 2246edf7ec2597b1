package graft

import graft.operators.RangeJoin
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Query catalog part 3 (round 2): window-rank kit, range frames,
  * histograms, exact-sum correlation, bucketed range join, array ops,
  * repetition/quality signals, corpus n-gram stats, TF-IDF, edit-distance
  * fuzzy dedup. Same oracle discipline as [[Queries]]: exact integer /
  * decimal arithmetic up to one final deterministic double op, full
  * tiebreak ORDER BY, identical column names both sides.
  */
object QueriesExt {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
  private def d12(c: Column): Column = c.cast(DecimalType(12, 2))
  private def ts(c: Column): Column = c.cast("timestamp")

  // ───────────────────── window-function kit (R20) ─────────────────────

  /** rank / dense_rank / percent_rank / cume_dist / ntile in one pass —
    * one shuffle on the partition key, all five from the same sort.
    */
  def qWindowRanks(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_custkey") < 100)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).cast("long").as("tile4"))
      .orderBy(col("o_orderpriority"), col("rnk"))
  }

  /** R33: value-position window functions — first/last/nth over the full
    * partition frame (explicit UNBOUNDED frame: last_value under the
    * default frame is just the current row, a classic silent bug).
    */
  def qWindowFirstLast(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_custkey") < 100)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o.select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        first(col("o_orderkey")).over(w).as("top_order"),
        last(col("o_orderkey")).over(w).as("bottom_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** RANGE-frame sliding aggregate: per user, the value sum/count over the
    * trailing 30 minutes by event time — frame bounds from the ORDER BY
    * value, not row offsets (R21).
    */
  def qWindowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(ts(col("ts"))).as("ts_sec"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-1800, 0)
    e.select(col("user_id"), col("event_id"), col("ts_sec"),
        sum(d12(col("value"))).over(w).cast("double").as("win_value"),
        count(lit(1)).over(w).cast("long").as("win_n"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Fixed-width histogram (R22): bucket arithmetic stays in codegen'd
    * builtins; one partial-aggregated groupBy regardless of corpus size.
    */
  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val bucket = floor((col("l_quantity") - 1) / 5.0).cast("long")
    li.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(d12(col("l_quantity"))).cast("double").as("sum_qty"))
      .withColumn("lo_qty", (col("bucket") * 5 + 1).cast("long"))
      .select(col("bucket"), col("lo_qty"), col("n"), col("sum_qty"))
      .orderBy(col("bucket"))
  }

  /** Pearson correlation + OLS slope from decimal-exact component sums
    * (R23). The five sums are exact; the final combination is a fixed
    * sequence of IEEE double ops written identically in the oracle SQL, so
    * the result is bit-deterministic — unlike corr()/covar(), whose
    * accumulation order is engine- and partition-dependent.
    */
  def qCorrStats(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val x = d12(col("l_quantity")); val y = d12(col("l_extendedprice"))
    val sums = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
    val nd = col("n").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val num = nd * d("sxy") - d("sx") * d("sy")
    val varx = nd * d("sxx") - d("sx") * d("sx")
    val vary = nd * d("syy") - d("sy") * d("sy")
    sums.select(col("l_returnflag"), col("n"),
        (num / (sqrt(varx) * sqrt(vary))).as("corr_qp"),
        (num / varx).as("slope_qp"))
      .orderBy(col("l_returnflag"))
  }

  /** Bucketed band join (R24): orders matched to price-tier intervals via
    * [[RangeJoin.bandJoin]] — an equi-join on bucket keys instead of the
    * broadcast-nested-loop a naive non-equi join plans.
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      (0L, 0.0, 1000.0), (1L, 1000.0, 5000.0), (2L, 5000.0, 20000.0),
      (3L, 20000.0, 100000.0), (4L, 100000.0, 600000.0))
      .toDF("band_id", "lo", "hi")
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
    RangeJoin.bandJoin(o, col("o_totalprice"), bands, col("lo"), col("hi"),
        bucketWidth = 5000.0)
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_orders"),
        sum(d12(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("band_id"))
  }

  /** Day numbers (epoch days) of 8 quarter starts from 1994-01-01 —
    * computed once in Scala and embedded identically in the Spark plan
    * and the oracle SQL.
    */
  private[graft] val promoQuarters: Seq[(Long, Long, Long)] = {
    val starts = (0 until 9).map(q =>
      java.time.LocalDate.of(1994 + q / 4, q % 4 * 3 + 1, 1).toEpochDay)
    starts.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) => (i.toLong, lo, hi) }.toSeq
  }

  /** R35: interval-overlap join — order activity windows [orderdate,
    * +30 days) against quarterly promo windows, via the bucketed overlap
    * join (emit-once bucket trick, no dedup pass).
    */
  def qOverlapJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val promos = promoQuarters.toDF("promo_id", "p_lo", "p_hi")
    val o = t(s, dir, "orders").select(col("o_orderkey"),
        floor(unix_timestamp(ts(col("o_orderdate"))) / 86400).cast("long").as("a_lo"))
      .withColumn("a_hi", col("a_lo") + 30)
    graft.operators.RangeJoin.overlapJoin(
        o, col("a_lo"), col("a_hi"), promos, col("p_lo"), col("p_hi"),
        bucketWidth = 91.0)
      .groupBy(col("promo_id"))
      .agg(count(lit(1)).as("n_orders"), min(col("a_lo")).as("first_day"),
        max(col("a_lo")).as("last_day"))
      .orderBy(col("promo_id"))
  }

  /** Lateral array expansion (R25): posexplode with ordinality. */
  def qArrayOps(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").filter(col("doc_id") < 20)
    d.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
      .orderBy(col("doc_id"), col("pos"))
  }

  // ───────────────── training-data text operators (T5–T7) ─────────────────

  /** T5: repetition signals (Gopher-style quality filters): distinct-token
    * ratio, top-token share, duplicate word-bigram share. Shape: one token
    * explode → (doc, token) counts → per-doc aggregate; bigrams likewise.
    * All ratios are int/int rationals → one deterministic double division.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
    val tf = tok.groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("c"))
    val tokStats = tf.groupBy(col("doc_id")).agg(
      sum(col("c")).cast("long").as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).cast("long").as("top_cnt"))
    val bg = d.select(col("doc_id"),
      explode(graft.functions.TextFunctions.wordShingles(col("text"), 2)).as("g"))
    val bgStats = bg.groupBy(col("doc_id")).agg(
      count(lit(1)).as("total_bg"), countDistinct(col("g")).as("distinct_bg"))
    tokStats.join(bgStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"),
        (col("top_cnt").cast("double") / col("n_tokens")).as("top_share"),
        when(col("total_bg").isNull || col("total_bg") === 0, lit(0.0))
          .otherwise((col("total_bg") - col("distinct_bg")).cast("double") / col("total_bg"))
          .as("dup_bigram_share"))
      .orderBy(col("doc_id"))
  }

  /** T6: corpus-wide heavy hitters — top-20 word bigrams. Partial (map-side)
    * aggregation does the scale work; the final top-k is a 20-row sort.
    */
  def textNgramTopk(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(explode(graft.functions.TextFunctions.wordShingles(col("text"), 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("g"))
      .limit(20)
  }

  /** T7: TF-IDF top-3 terms per document. df comes from the full corpus;
    * the score is floor(tf·10⁶·N/df) — exact integer products below 2⁵³
    * then one correctly-rounded division, so ranking and value are
    * engine-deterministic without trusting log().
    */
  def textTfidf(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = d.agg(count(lit(1)).as("n_docs"))
    val scored = tf.filter(col("doc_id") < 50)
      .join(df, Seq("term")).crossJoin(broadcast(n))
      .withColumn("score",
        floor(col("tf").cast("double") * 1000000.0 * col("n_docs").cast("double")
          / col("df").cast("double")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tf").cast("long").as("tf"),
        col("score").cast("long").as("score"), col("rn").cast("long").as("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** R26: the DataFrame pivot API — explicit value list keeps the plan
    * single-pass (no extra distinct-scan job) and the output schema static.
    */
  def qPivotApi(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(sum(d12(col("o_totalprice"))).cast("double"))
      .withColumnsRenamed(Map("O" -> "open_total", "F" -> "filled_total",
        "P" -> "pending_total"))
      .orderBy(col("o_orderpriority"))
  }

  /** R27: correlated scalar subquery through the SQL surface — Catalyst
    * de-correlates it into an aggregate + left outer join, so the plan is
    * one shuffle, not a per-row probe.
    */
  def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_orders_sq")
    t(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem_sq")
    s.sql(
      """SELECT o_orderkey, o_totalprice,
        |  (SELECT COUNT(*) FROM graft_lineitem_sq WHERE l_orderkey = o_orderkey) AS n_items
        |FROM graft_orders_sq
        |WHERE o_custkey < 50
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** S5: per-label embedding corpus statistics. Counts/dims are exact;
    * min/max of the per-row L2 norm are safe cross-engine because each
    * norm is a single-row computation (fixed accumulation order) and
    * min/max are insensitive to row order — unlike a SUM or AVG of norms,
    * which would be partition-order-dependent in double.
    */
  def qEmbedStats(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    e.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(size(col("embedding"))).cast("long").as("dim"),
        min(graft.functions.VectorFunctions.norm(col("embedding"))).as("min_norm"),
        max(graft.functions.VectorFunctions.norm(col("embedding"))).as("max_norm"),
        min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"))
      .orderBy(col("label"))
  }

  /** R34: grouped top-k via the typed bounded-memory Aggregator — same
    * results and oracle as the window form (q_window_topk), entirely
    * different physical shape: map-side partial top-k, no partition sort.
    */
  def qTopKAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .map { case (ck, ok, price) => (ck, graft.operators.TypedTopK.Entry(price, ok)) }
    graft.operators.TypedTopK.topKPerKey(rows, 3)
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "rnk")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** R36: modern aggregate kit — count_if, bool_and/bool_or, max_by/
    * min_by. The arg-extrema ordering value is made UNIQUE (decimal
    * price·10¹² + orderkey, exact integer arithmetic): a 0.01 price step
    * is worth 10¹⁰ ordinal units, strictly above any orderkey through
    * ~sf1000, so no two rows can collide — with ties, which row max_by
    * returns is engine- and partition-order-dependent, the classic
    * silent nondeterminism of arg_max.
    */
  def qAggKit(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val ord = (d12(col("o_totalprice")) * lit(1000000000000L) + col("o_orderkey"))
      .cast(DecimalType(26, 0))
    o.groupBy(col("o_orderpriority"))
      .agg(
        count_if(col("o_orderstatus") === "O").as("n_open"),
        bool_or(col("o_totalprice") > 400000).as("any_jumbo"),
        bool_and(col("o_totalprice") > 900).as("all_above_min"),
        max_by(col("o_orderkey"), ord).as("priciest_order"),
        min_by(col("o_orderkey"), ord).as("cheapest_order"))
      .orderBy(col("o_orderpriority"))
  }

  /** R31: outer joins — left outer with null-extension counting and a
    * full outer between partially-overlapping key sets, in one result.
    */
  def qOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_custkey") < 200)
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = t(s, dir, "orders").filter(col("o_orderdate").cast("timestamp") <
        lit("1995-01-01 00:00:00").cast("timestamp"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"),
        sum(d12(col("o_totalprice"))).cast("double").as("tot"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_mktsegment"), lit("(none)")).as("segment"),
        coalesce(col("n_ord"), lit(0L)).as("n_ord"),
        col("tot"))
      .orderBy(col("custkey"))
  }

  /** R32: null-handling kit — coalesce/nullif/nvl2-style/null-aware
    * comparisons, the semantics every replica query leans on.
    */
  def qNullFuncs(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderkey") < 2000)
    val maybeTot = when(col("o_orderstatus") === "O", col("o_totalprice"))
    o.select(col("o_orderkey"),
        coalesce(maybeTot, lit(-1.0)).as("tot_or_default"),
        nullif(col("o_orderstatus"), lit("F")).as("status_nf"),
        when(maybeTot.isNull, "closed").otherwise("open").as("bucket"),
        maybeTot.isNull.as("is_closed"),
        (maybeTot <=> lit(null)).as("null_safe_eq"))
      .orderBy(col("o_orderkey"))
  }

  /** R29: bag-semantics set ops (INTERSECT ALL / EXCEPT ALL) — duplicate
    * multiplicity preserved, unlike the distinct variants in q_set_ops.
    */
  def qSetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select((col("o_custkey") % 100).as("k"))
    val e = t(s, dir, "events").select((col("user_id") % 100).as("k"))
    def cnt(df: DataFrame, label: String) =
      df.agg(count(lit(1)).as("n")).withColumn("bucket", lit(label))
        .select(col("bucket"), col("n"))
    cnt(o.intersectAll(e), "inter_all")
      .unionByName(cnt(o.exceptAll(e), "except_all"))
      .orderBy(col("bucket"))
  }

  /** R30: math function kit — only ops with exact or correctly-rounded
    * IEEE semantics in both engines (abs/sign/mod/floor/ceil/round/sqrt);
    * transcendentals (exp/ln/trig) are NOT correctly rounded and are
    * deliberately excluded from cross-engine hashing.
    */
  def qMathFuncs(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") < 500)
    li.select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("abs_dev"),
        signum(col("l_quantity") - 25).cast("long").as("sign_dev"),
        (col("l_orderkey") % 7).cast("long").as("mod7"),
        floor(col("l_extendedprice") / 100).cast("long").as("price_floor"),
        ceil(col("l_extendedprice") / 100).cast("long").as("price_ceil"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** R28: resample + forward fill — hourly grid per user between first and
    * last event, gaps carrying the last observed hourly value sum.
    */
  def qResampleFfill(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").filter(col("user_id") < 10)
    val obs = e.groupBy(col("user_id"),
        floor(unix_timestamp(ts(col("ts"))) / 3600).cast("long").as("bh"))
      .agg(sum(d12(col("value"))).as("v"))
    graft.operators.Resample.forwardFill(obs, col("user_id"), col("bh"), col("v"))
      .select(col("key").as("user_id"), col("bucket").as("bucket_hour"),
        col("value").isNotNull.as("is_observed"),
        col("filled").cast("double").as("filled_value"))
      .orderBy(col("user_id"), col("bucket_hour"))
  }

  /** T8: stratified deterministic sampling — an independent md5-coin per
    * row with a per-stratum acceptance threshold (here: lang, rarer
    * languages kept at higher rates). Reproducible on any engine, no
    * global sort, no per-stratum pass; the hash filter pushes into the
    * scan like any predicate.
    */
  def textSampleStratified(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    // acceptance threshold on the first 2 hex chars of the row coin
    val coin = substring(md5(concat_ws(":", col("doc_id"), col("lang"))), 1, 2)
    val thresh = when(col("lang") === "en", lit("20")) // ~12.5%
      .when(col("lang") === "de", lit("40"))           // ~25%
      .otherwise(lit("80"))                            // ~50%
    d.filter(coin < thresh)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** T10: per-source frequency capping — keep at most `cap` documents per
    * source, chosen by a deterministic md5 ordering (the standard
    * downsampling of over-represented domains before training). Runs on
    * the NATIVE grouped top-k operator: per-partition bounded buffers cap
    * pre-shuffle volume at O(partitions·sources·cap) — a skewed source
    * with 10⁹ docs never sorts or shuffles in full. The md5-prefix score
    * uses 12 hex digits (48 bits): exact in both double and BIGINT, so
    * the SQL oracle orders identically.
    */
  def textCapSources(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val hash48 = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("long")
    graft.plans.GroupedTopK.topK(
        d.select(col("doc_id"), col("source"), hash48.as("h48")),
        Seq("source"), score = -col("h48"), tie = col("doc_id"),
        k = 10, rankName = "rnk")
      .select(col("doc_id"), col("source"), col("rnk"))
      .orderBy(col("doc_id"))
  }

  /** T9: sequence packing — assign docs to fixed token-budget chunks, per
    * source, in doc order: a doc's chunk is its starting token offset
    * divided by the budget (contiguous fill; a doc that crosses a boundary
    * opens the next chunk's worth but is never split). One window cumsum
    * per source — the standard way to pack a 100 TB corpus into training
    * sequences without a driver-side loop.
    */
  def textPackSequences(s: SparkSession, dir: String): DataFrame = {
    val budget = 256L
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        ((col("cum") - col("n_tokens")) / budget).cast("long").as("chunk_id"))
      .orderBy(col("doc_id"))
  }

  /** M3: image metadata decode. Payloads are deterministic synthetic PNGs
    * (magic + IHDR with dimensions derived from doc_id), parsed back by the
    * native header decoder — the oracle checks construct→parse as an
    * arithmetic identity, so a parser regression breaks the hash match.
    */
  def mmImageMeta(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
    val w = (col("doc_id") % 640 + 1).cast("int")
    val h = (col("doc_id") % 480 + 1).cast("int")
    val payload = unhex(concat(
      lit("89504E470D0A1A0A0000000D49484452"),
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("0806000000")))
    d.withColumn("meta", graft.multimodal.ImageHeader.image_meta(payload))
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"))
      .orderBy(col("doc_id"))
  }

  /** M4: audio metadata decode — synthetic RIFF/WAVE headers with fmt
    * fields derived from doc_id, parsed back by the native header decoder;
    * construct→parse identity oracle like mm_image_meta.
    */
  def mmAudioMeta(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
    // little-endian hex of a value, n bytes
    def le(v: Column, nBytes: Int): Column =
      concat((0 until nBytes).map(i =>
        lpad(hex(pmod(v.cast("long") / (1L << (8 * i)), lit(256)).cast("int")), 2, "0")): _*)
    val channels = (col("doc_id") % 2 + 1).cast("int")
    val rate = (lit(8000) + (col("doc_id") % 5) * 4000).cast("int")
    val bits = lit(16)
    val payload = unhex(concat(
      lit("52494646"), le(lit(36), 4), lit("57415645"),         // RIFF size WAVE
      lit("666d7420"), le(lit(16), 4),                          // fmt chunk, 16 bytes
      le(lit(1), 2), le(channels, 2), le(rate, 4),              // pcm, channels, rate
      le(rate * channels * 2, 4), le(channels * 2, 2), le(bits, 2)))
    d.withColumn("meta", graft.multimodal.AudioHeader.audio_meta(payload))
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.channels").cast("long").as("channels"),
        col("meta.sample_rate").cast("long").as("sample_rate"),
        col("meta.bits_per_sample").cast("long").as("bits_per_sample"))
      .orderBy(col("doc_id"))
  }

  /** D6: edit-distance fuzzy dedup — length-banded blocking (same source,
    * |Δlen| ≤ 10, len ≤ 150 so the O(len²) distance stays bounded), then
    * exact Levenshtein on the surviving pairs only.
    *
    * Fixture realism (r9, closing the r8 "trivially green at 0 rows"
    * finding): the synthetic corpus has no true fuzzy pairs, so the gate
    * injects single-character-deletion variants of every 13th short
    * document (the E1 `erEntities` idiom) — each master/variant pair is
    * 1 edit apart and survives the length band, so the gate returns
    * real matched pairs at every SF and the oracle replays the same
    * injection.
    */
  def dedupFuzzyEdit(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"), col("source"))
    val variants = d
      .filter(col("doc_id") % 13 === 0 &&
        length(col("text")).between(20, 150))
      .withColumn("p", (lit(5) + col("doc_id") % 10).cast("int"))
      .select((col("doc_id") + 10000000L).as("doc_id"),
        expr("concat(substring(text, 1, p), substring(text, p + 2, 200))").as("text"),
        col("source"))
    val base = d.unionByName(variants)
      .select(col("doc_id"), col("text"), col("source"), length(col("text")).as("len"))
      .filter(col("len") <= 150)
    val a = base.select(col("doc_id").as("id_a"), col("text").as("text_a"),
      col("source"), col("len").as("len_a"))
    val b = base.select(col("doc_id").as("id_b"), col("text").as("text_b"),
      col("source").as("source_b"), col("len").as("len_b"))
    // 3-arg levenshtein runs the banded DP with early exit (-1 beyond the
    // bound): O(k·len) per pair instead of O(len²); equal to the exact
    // distance whenever it's within the bound
    a.join(b, col("source") === col("source_b") && col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= 10)
      .withColumn("dist", levenshtein(col("text_a"), col("text_b"), 30).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= 30)
      .select(col("id_a"), col("id_b"), col("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // ─────────────────────── oracle SQL (DuckDB) ───────────────────────

  private val D = "CAST(%s AS DECIMAL(12,2))"
  private def dec(c: String) = D.format(c)

  val sql: Map[String, String] = Map(
    "q_window_ranks" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist,
        |  CAST(ntile(4) OVER w AS BIGINT) AS tile4
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rnk""".stripMargin,
    "q_window_firstlast" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  first_value(o_orderkey) OVER w AS top_order,
        |  last_value(o_orderkey) OVER w AS bottom_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_window_range_frame" ->
      s"""SELECT user_id, event_id, ts_sec,
         |  CAST(SUM(${dec("value")}) OVER w AS DOUBLE) AS win_value,
         |  CAST(COUNT(*) OVER w AS BIGINT) AS win_n
         |FROM (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value
         |      FROM events WHERE user_id < 20) t
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
         |             RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, event_id""".stripMargin,
    "q_histogram" ->
      s"""SELECT CAST(floor((l_quantity - 1) / 5.0) AS BIGINT) AS bucket,
         |  CAST(floor((l_quantity - 1) / 5.0) * 5 + 1 AS BIGINT) AS lo_qty,
         |  COUNT(*) AS n,
         |  CAST(SUM(${dec("l_quantity")}) AS DOUBLE) AS sum_qty
         |FROM lineitem GROUP BY 1, 2 ORDER BY bucket""".stripMargin,
    // decimal→double goes through VARCHAR: DuckDB's direct decimal cast is
    // not correctly rounded at scale 4 (…8685 → …869), while strtod and
    // Spark's BigDecimal.doubleValue both round correctly
    "q_corr_stats" ->
      s"""WITH sums AS (
         |  SELECT l_returnflag, COUNT(*) AS n,
         |    CAST(CAST(SUM(${dec("l_quantity")}) AS VARCHAR) AS DOUBLE) AS sx,
         |    CAST(CAST(SUM(${dec("l_extendedprice")}) AS VARCHAR) AS DOUBLE) AS sy,
         |    CAST(CAST(SUM(${dec("l_quantity")} * ${dec("l_quantity")}) AS VARCHAR) AS DOUBLE) AS sxx,
         |    CAST(CAST(SUM(${dec("l_extendedprice")} * ${dec("l_extendedprice")}) AS VARCHAR) AS DOUBLE) AS syy,
         |    CAST(CAST(SUM(${dec("l_quantity")} * ${dec("l_extendedprice")}) AS VARCHAR) AS DOUBLE) AS sxy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  (CAST(n AS DOUBLE) * sxy - sx * sy) /
         |    (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_qp,
         |  (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope_qp
         |FROM sums ORDER BY l_returnflag""".stripMargin,
    "q_range_join" ->
      s"""WITH bands(band_id, lo, hi) AS (VALUES
         |  (0, 0.0, 1000.0), (1, 1000.0, 5000.0), (2, 5000.0, 20000.0),
         |  (3, 20000.0, 100000.0), (4, 100000.0, 600000.0))
         |SELECT CAST(band_id AS BIGINT) AS band_id, COUNT(*) AS n_orders,
         |  CAST(SUM(${dec("o_totalprice")}) AS DOUBLE) AS sum_price
         |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "q_array_ops" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ts[i] AS tok
        |FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
        |      FROM (SELECT doc_id, str_split(text, ' ') AS ts
        |            FROM documents WHERE doc_id < 20) d) t
        |ORDER BY doc_id, pos""".stripMargin,
    "text_repetition" ->
      """WITH tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tk FROM documents),
        |tf AS (SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |tok_stats AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_cnt
        |  FROM tf GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |        FROM (SELECT doc_id, str_split(text, ' ') AS ts FROM documents) d) t),
        |bg_stats AS (
        |  SELECT doc_id, COUNT(*) AS total_bg, COUNT(DISTINCT g) AS distinct_bg
        |  FROM bg GROUP BY doc_id)
        |SELECT s.doc_id, s.n_tokens, s.n_distinct,
        |  CAST(s.n_distinct AS DOUBLE) / s.n_tokens AS distinct_ratio,
        |  CAST(s.top_cnt AS DOUBLE) / s.n_tokens AS top_share,
        |  CASE WHEN b.total_bg IS NULL OR b.total_bg = 0 THEN 0.0
        |    ELSE CAST(b.total_bg - b.distinct_bg AS DOUBLE) / b.total_bg END AS dup_bigram_share
        |FROM tok_stats s LEFT JOIN bg_stats b ON b.doc_id = s.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    "text_ngram_topk" ->
      """SELECT ts[i] || ' ' || ts[i+1] AS g, COUNT(*) AS cnt
        |FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |      FROM (SELECT str_split(text, ' ') AS ts FROM documents) d) t
        |GROUP BY 1 ORDER BY cnt DESC, g LIMIT 20""".stripMargin,
    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    floor(CAST(tf.tf AS DOUBLE) * 1000000.0 * CAST(n.n_docs AS DOUBLE)
        |      / CAST(df.df AS DOUBLE)) AS score
        |  FROM tf JOIN df ON df.term = tf.term CROSS JOIN n
        |  WHERE tf.doc_id < 50)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
        |  CAST(score AS BIGINT) AS score, CAST(rn AS BIGINT) AS rnk
        |FROM (SELECT doc_id, term, tf, score,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |      FROM scored) t
        |WHERE rn <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "q_top_k_agg" -> Queries.sqlRelational("q_window_topk"),
    "q_overlap_join" -> {
      val promoValues = promoQuarters
        .map { case (id, lo, hi) => s"($id, $lo, $hi)" }.mkString(", ")
      s"""WITH promos(promo_id, p_lo, p_hi) AS (VALUES $promoValues),
         |o AS (SELECT o_orderkey,
         |        CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS a_lo
         |      FROM orders)
         |SELECT CAST(promo_id AS BIGINT) AS promo_id, COUNT(*) AS n_orders,
         |  MIN(a_lo) AS first_day, MAX(a_lo) AS last_day
         |FROM o JOIN promos ON a_lo < p_hi AND p_lo < a_lo + 30
         |GROUP BY promo_id ORDER BY promo_id""".stripMargin
    },
    "q_agg_kit" ->
      s"""SELECT o_orderpriority,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
         |  bool_or(o_totalprice > 400000) AS any_jumbo,
         |  bool_and(o_totalprice > 900) AS all_above_min,
         |  arg_max(o_orderkey, ${dec("o_totalprice")} * 1000000000000 + o_orderkey) AS priciest_order,
         |  arg_min(o_orderkey, ${dec("o_totalprice")} * 1000000000000 + o_orderkey) AS cheapest_order
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_outer_join" ->
      s"""WITH c AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 200),
         |o AS (SELECT o_custkey, COUNT(*) AS n_ord,
         |        CAST(SUM(${dec("o_totalprice")}) AS DOUBLE) AS tot
         |      FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
         |      GROUP BY o_custkey)
         |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
         |  COALESCE(c_mktsegment, '(none)') AS segment,
         |  COALESCE(n_ord, 0) AS n_ord, tot
         |FROM c FULL JOIN o ON c_custkey = o_custkey
         |ORDER BY custkey""".stripMargin,
    "q_null_funcs" ->
      """SELECT o_orderkey,
        |  COALESCE(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END, -1.0) AS tot_or_default,
        |  NULLIF(o_orderstatus, 'F') AS status_nf,
        |  CASE WHEN (CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) IS NULL
        |    THEN 'closed' ELSE 'open' END AS bucket,
        |  (CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) IS NULL AS is_closed,
        |  (CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) IS NOT DISTINCT FROM NULL AS null_safe_eq
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,
    "q_set_ops_all" ->
      """SELECT 'except_all' AS bucket, COUNT(*) AS n FROM
        |  (SELECT o_custkey % 100 AS k FROM orders EXCEPT ALL SELECT user_id % 100 FROM events) t
        |UNION ALL
        |SELECT 'inter_all' AS bucket, COUNT(*) AS n FROM
        |  (SELECT o_custkey % 100 AS k FROM orders INTERSECT ALL SELECT user_id % 100 FROM events) t
        |ORDER BY bucket""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS abs_dev,
        |  CAST(sign(l_quantity - 25) AS BIGINT) AS sign_dev,
        |  CAST(l_orderkey % 7 AS BIGINT) AS mod7,
        |  CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice / 100) AS BIGINT) AS price_ceil,
        |  CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
        |  sqrt(l_quantity) AS sqrt_qty,
        |  l_quantity * l_quantity AS qty_sq
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_resample_ffill" ->
      s"""WITH obs AS (
         |  SELECT user_id AS k, CAST(floor(epoch(ts)/3600) AS BIGINT) AS b,
         |    SUM(${dec("value")}) AS v
         |  FROM events WHERE user_id < 10 GROUP BY 1, 2
         |), bounds AS (SELECT k, MIN(b) AS b0, MAX(b) AS b1 FROM obs GROUP BY k),
         |grid AS (SELECT k, unnest(generate_series(b0, b1)) AS b FROM bounds),
         |j AS (SELECT g.k, g.b, o.v FROM grid g
         |      LEFT JOIN obs o ON o.k = g.k AND o.b = g.b)
         |SELECT k AS user_id, b AS bucket_hour, (v IS NOT NULL) AS is_observed,
         |  CAST(last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled_value
         |FROM j ORDER BY user_id, bucket_hour""".stripMargin,
    "text_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(doc_id || ':' || lang), 1, 2) <
        |  CASE WHEN lang = 'en' THEN '20' WHEN lang = 'de' THEN '40' ELSE '80' END
        |ORDER BY doc_id""".stripMargin,
    // T10: rank within source by the 48-bit md5 prefix ascending (the
    // Spark side scores by its negation in the top-k operator), doc_id
    // tiebreak, keep 10
    "text_cap_sources" ->
      """SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk FROM (
        |  SELECT doc_id, source, ROW_NUMBER() OVER (
        |    PARTITION BY source
        |    ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT),
        |             doc_id) AS rnk
        |  FROM documents) t
        |WHERE rnk <= 10 ORDER BY doc_id""".stripMargin,
    "text_pack_sequences" ->
      """SELECT doc_id, source, n_tokens,
        |  CAST((cum - n_tokens) // 256 AS BIGINT) AS chunk_id
        |FROM (
        |  SELECT doc_id, source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (SELECT doc_id, source,
        |          CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
        |        FROM documents) t) p
        |ORDER BY doc_id""".stripMargin,
    "mm_audio_meta" ->
      """SELECT doc_id, 'wav' AS format,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        |  CAST(8000 + (doc_id % 5) * 4000 AS BIGINT) AS sample_rate,
        |  CAST(16 AS BIGINT) AS bits_per_sample
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_image_meta" ->
      """SELECT doc_id, 'png' AS format,
        |  CAST(doc_id % 640 + 1 AS BIGINT) AS width,
        |  CAST(doc_id % 480 + 1 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_pivot_api" ->
      s"""SELECT o_orderpriority,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN ${dec("o_totalprice")} END) AS DOUBLE) AS open_total,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN ${dec("o_totalprice")} END) AS DOUBLE) AS filled_total,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN ${dec("o_totalprice")} END) AS DOUBLE) AS pending_total
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice,
        |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
        |FROM orders
        |WHERE o_custkey < 50
        |ORDER BY o_orderkey""".stripMargin,
    "q_embed_stats" ->
      """WITH flat AS (
        |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, label, sqrt(SUM(x*x)) AS nrm, COUNT(*) AS dim
        |  FROM flat GROUP BY vec_id, label
        |)
        |SELECT label, COUNT(*) AS n_vecs, CAST(MIN(dim) AS BIGINT) AS dim,
        |  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
        |  MIN(vec_id) AS min_id, MAX(vec_id) AS max_id
        |FROM norms GROUP BY label ORDER BY label""".stripMargin,
    "dedup_fuzzy_edit" ->
      """WITH variants AS (
        |  SELECT doc_id + 10000000 AS doc_id,
        |    substring(text, 1, CAST(5 + doc_id % 10 AS INT)) ||
        |      substring(text, CAST(7 + doc_id % 10 AS INT), 200) AS text,
        |    source
        |  FROM documents
        |  WHERE doc_id % 13 = 0 AND length(text) BETWEEN 20 AND 150
        |), unioned AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL SELECT doc_id, text, source FROM variants
        |), base AS (
        |  SELECT doc_id, text, source, length(text) AS len
        |  FROM unioned WHERE length(text) <= 150)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        |FROM base a JOIN base b
        |  ON a.source = b.source AND a.doc_id < b.doc_id
        |  AND abs(a.len - b.len) <= 10
        |WHERE levenshtein(a.text, b.text) <= 30
        |ORDER BY id_a, id_b""".stripMargin)
}
