package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Unigram
import graft.sources.Tables

/** Round-8 surface growth: unigram-LM (SentencePiece-family)
  * tokenization (T35) beside the r7 BPE trainer — the other trained
  * tokenizer family modern models ship — with the packing budget
  * operator gaining a unigram variant (T9c). House contract as
  * everywhere: integer/string outputs, deterministic total orders,
  * every gate a bit-exact hash compare against DuckDB (the trained
  * pipeline replayed as a chained materialized-CTE pyramid, the T34
  * oracle pattern).
  */
object QueriesR17 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // One training per (SparkContext, data dir): vocabulary-sized tables,
  // ckpt'd, consumed by three gates — the BPE staging idiom.
  private val uniMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      (DataFrame, DataFrame)]()

  private def uniTrained(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    uniMemo.computeIfAbsent((s.sparkContext.applicationId, dir), _ =>
      Unigram.train(t(s, dir, "documents"), col("text")))

  /** Force the shared trained-unigram staging for this (session, dir) —
    * called by [[Bench]] before its timed loop (the stageShared idiom).
    */
  private[graft] def stageShared(s: SparkSession, dir: String): Unit = {
    val (vocab, dp) = uniTrained(s, dir)
    vocab.count(); dp.count()
  }

  /** Per-doc (doc_id, source, n_uni) off the shared trained state. */
  private def uniDocCounts(s: SparkSession, dir: String): DataFrame = {
    val (_, dp) = uniTrained(s, dir)
    val nPieces = dp.filter(col("pos") === length(col("w")))
      .select(col("w"), col("n").as("n_p"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(nPieces), Seq("w"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("n_p")).as("n_uni"))
  }

  /** T35: the trained unigram vocabulary — retained pieces with their
    * final M-step counts (see [[graft.operators.Unigram]]).
    */
  def textUnigramVocab(s: SparkSession, dir: String): DataFrame = {
    val (vocab, _) = uniTrained(s, dir)
    vocab.orderBy(col("piece"))
  }

  /** T35: per-document token accounting under the trained unigram
    * model — (doc_id, n_ws, n_uni), the [[Unigram.tokenCounts]] shape
    * off the shared staging.
    */
  def textUnigramTokenize(s: SparkSession, dir: String): DataFrame = {
    val (_, dp) = uniTrained(s, dir)
    val nPieces = dp.filter(col("pos") === length(col("w")))
      .select(col("w"), col("n").as("n_p"))
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(nPieces), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ws"), sum(col("n_p")).as("n_uni"))
      .orderBy(col("doc_id"))
  }

  /** T9c: sequence packing budgeted in unigram pieces — T9b's greedy
    * per-source cumulative packing re-pointed at the second tokenizer
    * family. Budget 512 pieces per chunk; exact integer division.
    */
  def textPackUnigram(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    uniDocCounts(s, dir)
      .withColumn("cum", sum(col("n_uni")).over(w))
      .select(col("doc_id"), col("source"), col("n_uni"),
        expr("(cum - n_uni) div 512").as("chunk_id"))
      .orderBy(col("doc_id"))
  }

  /** M10: true BMP raster decode — each row synthesizes a REAL 24-bit
    * BMP file (valid headers, bottom-up padded BGR rows) whose pixel
    * bytes are a deterministic function of doc_id, and
    * [[graft.multimodal.BmpRaster]] decodes it back to channel sums and
    * a luminance histogram; the oracle regenerates the same pixels
    * arithmetically (the construct→parse identity contract of the
    * M-family). The decoder itself is format-real — the spec validates
    * it against the JDK's own BMP encoder.
    */
  /** Little-endian hex of a (small, non-negative) integer column over
    * `nBytes` bytes — the M-family fixture-construction helper.
    */
  private def le(v: Column, nBytes: Int): Column =
    concat((0 until nBytes).map(i =>
      lpad(hex(pmod(v.cast("long") / (1L << (8 * i)), lit(256)).cast("int")),
        2, "0")): _*)

  def mmBmpStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
      .withColumn("w", (col("doc_id") % 5 + 1).cast("int"))
      .withColumn("h", (col("doc_id") % 3 + 1).cast("int"))
      .withColumn("rs", expr("((3 * w + 3) div 4) * 4").cast("int"))
    val header = concat(
      lit("424D"), le(lit(54) + col("rs") * col("h"), 4), lit("00000000"),
      le(lit(54), 4),
      le(lit(40), 4), le(col("w"), 4), le(col("h"), 4),
      le(lit(1), 2), le(lit(24), 2), le(lit(0), 4),
      le(col("rs") * col("h"), 4), lit("0" * 32))
    val pixels = expr(
      """array_join(transform(sequence(0, rs * h - 1), i ->
        |  CASE WHEN (i % rs) >= 3 * w THEN '00'
        |       ELSE lpad(hex((doc_id * 7 + i * 13) % 256), 2, '0') END), '')""".stripMargin)
    d.withColumn("st",
        graft.multimodal.BmpRaster.bmp_stats(unhex(concat(header, pixels))))
      .select(Seq(col("doc_id")) ++
        graft.multimodal.BmpRaster.schema.fieldNames.map(f =>
          col(s"st.$f").as(f)): _*)
      .withColumn("width", col("width").cast("long"))
      .withColumn("height", col("height").cast("long"))
      .orderBy(col("doc_id"))
  }

  /** M11: true WAV waveform decode — each row synthesizes a REAL 16-bit
    * PCM WAV file (RIFF + fmt + data, interleaved little-endian
    * samples) whose samples are a deterministic function of doc_id, and
    * [[graft.multimodal.WavPcm]] decodes it back to frame/duration/
    * peak/energy/clipping statistics; the oracle regenerates the
    * samples arithmetically (the construct→parse identity). The decoder
    * is format-real — the spec validates it against the JDK's own WAV
    * encoder.
    */
  def mmWavStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
      .withColumn("ch", (col("doc_id") % 2 + 1).cast("int"))
      .withColumn("rate", (lit(8000) + (col("doc_id") % 5) * 4000).cast("int"))
      .withColumn("nf", (lit(20) + col("doc_id") % 11).cast("int"))
      .withColumn("ns", col("nf") * col("ch"))
    val header = concat(
      lit("52494646"), le(lit(36) + col("ns") * 2, 4), lit("57415645"),
      lit("666D7420"), le(lit(16), 4), le(lit(1), 2), le(col("ch"), 2),
      le(col("rate"), 4), le(col("rate") * col("ch") * 2, 4),
      le(col("ch") * 2, 2), le(lit(16), 2),
      lit("64617461"), le(col("ns") * 2, 4))
    val samples = expr(
      """array_join(transform(sequence(0, ns - 1), k ->
        |  concat(lpad(hex(((doc_id * 37 + k * 97) % 65536) % 256), 2, '0'),
        |         lpad(hex(((doc_id * 37 + k * 97) % 65536) div 256), 2, '0'))), '')""".stripMargin)
    d.withColumn("st",
        graft.multimodal.WavPcm.wav_stats(unhex(concat(header, samples))))
      .select(Seq(col("doc_id")) ++
        graft.multimodal.WavPcm.schema.fieldNames.map(f =>
          col(s"st.$f").as(f)): _*)
      .withColumn("channels", col("channels").cast("long"))
      .withColumn("sample_rate", col("sample_rate").cast("long"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_unigram_vocab" -> (textUnigramVocab _),
    "text_unigram_tokenize" -> (textUnigramTokenize _),
    "text_pack_unigram" -> (textPackUnigram _),
    "mm_bmp_stats" -> (mmBmpStats _),
    "mm_wav_stats" -> (mmWavStats _))

  val sql: Map[String, String] = Map(
    "text_unigram_vocab" ->
      Unigram.vocabOracle("documents", "text"),
    "text_unigram_tokenize" ->
      Unigram.tokenCountsOracle("documents", "doc_id", "text"),
    "text_pack_unigram" ->
      s"""WITH ${Unigram.oracleCtes("documents", "text")},
         |${Unigram.npCte},
         |db AS MATERIALIZED (
         |  SELECT doc_id, source, CAST(SUM(n_p) AS BIGINT) AS n_uni
         |  FROM (SELECT doc_id, source,
         |          unnest(string_split(text, ' ')) AS w
         |        FROM documents) dw
         |  JOIN np USING (w)
         |  WHERE w <> '' GROUP BY doc_id, source
         |),
         |ck AS (
         |  SELECT doc_id, source, n_uni,
         |         SUM(n_uni) OVER (PARTITION BY source ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM db
         |)
         |SELECT doc_id, source, n_uni,
         |  CAST((cum - n_uni) // 512 AS BIGINT) AS chunk_id
         |FROM ck ORDER BY doc_id""".stripMargin,
    "mm_bmp_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 5 + 1 AS w, doc_id % 3 + 1 AS h,
        |         ((3 * (doc_id % 5 + 1) + 3) // 4) * 4 AS rs
        |  FROM documents
        |), bytes AS (
        |  SELECT doc_id, w, h, rs, i,
        |         (doc_id * 7 + i * 13) % 256 AS v
        |  FROM (SELECT doc_id, w, h, rs,
        |          unnest(generate_series(0, rs * h - 1)) AS i FROM dims)
        |  WHERE (i % rs) < 3 * w
        |), pix AS (
        |  SELECT doc_id,
        |         (i // rs) * w + (i % rs) // 3 AS p,
        |         CAST(SUM(CASE WHEN (i % rs) % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS r,
        |         CAST(SUM(CASE WHEN (i % rs) % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS g,
        |         CAST(SUM(CASE WHEN (i % rs) % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS b
        |  FROM bytes GROUP BY doc_id, p
        |), lum AS (
        |  SELECT doc_id, r, g, b,
        |         CASE WHEN (299*r + 587*g + 114*b) // 31875 > 7 THEN 7
        |              ELSE (299*r + 587*g + 114*b) // 31875 END AS bk
        |  FROM pix
        |)
        |SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,
        |  CAST(d.h AS BIGINT) AS height,
        |  CAST(d.w * d.h AS BIGINT) AS n_px,
        |  CAST(SUM(l.r) AS BIGINT) AS sum_r,
        |  CAST(SUM(l.g) AS BIGINT) AS sum_g,
        |  CAST(SUM(l.b) AS BIGINT) AS sum_b,
        |  CAST(SUM(CASE WHEN bk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
        |  CAST(SUM(CASE WHEN bk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
        |  CAST(SUM(CASE WHEN bk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
        |  CAST(SUM(CASE WHEN bk = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3,
        |  CAST(SUM(CASE WHEN bk = 4 THEN 1 ELSE 0 END) AS BIGINT) AS h4,
        |  CAST(SUM(CASE WHEN bk = 5 THEN 1 ELSE 0 END) AS BIGINT) AS h5,
        |  CAST(SUM(CASE WHEN bk = 6 THEN 1 ELSE 0 END) AS BIGINT) AS h6,
        |  CAST(SUM(CASE WHEN bk = 7 THEN 1 ELSE 0 END) AS BIGINT) AS h7
        |FROM dims d JOIN lum l USING (doc_id)
        |GROUP BY d.doc_id, d.w, d.h
        |ORDER BY d.doc_id""".stripMargin,
    "mm_wav_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 2 + 1 AS ch,
        |         8000 + (doc_id % 5) * 4000 AS rate,
        |         20 + doc_id % 11 AS nf,
        |         (doc_id % 2 + 1) * (20 + doc_id % 11) AS ns
        |  FROM documents
        |), smp AS (
        |  SELECT doc_id,
        |         CASE WHEN (doc_id * 37 + k * 97) % 65536 >= 32768
        |              THEN (doc_id * 37 + k * 97) % 65536 - 65536
        |              ELSE (doc_id * 37 + k * 97) % 65536 END AS s
        |  FROM (SELECT doc_id, unnest(generate_series(0, ns - 1)) AS k
        |        FROM dims)
        |)
        |SELECT d.doc_id, CAST(d.ch AS BIGINT) AS channels,
        |  CAST(d.rate AS BIGINT) AS sample_rate,
        |  CAST(d.nf AS BIGINT) AS n_frames,
        |  CAST(d.nf * 1000 // d.rate AS BIGINT) AS duration_ms,
        |  CAST(MAX(ABS(m.s)) AS BIGINT) AS peak_abs,
        |  CAST(SUM(m.s * m.s) AS BIGINT) AS sum_sq,
        |  CAST(SUM(CASE WHEN m.s IN (32767, -32768) THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        |FROM dims d JOIN smp m USING (doc_id)
        |GROUP BY d.doc_id, d.ch, d.rate, d.nf
        |ORDER BY d.doc_id""".stripMargin)
}
