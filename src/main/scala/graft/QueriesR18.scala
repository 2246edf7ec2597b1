package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Round-8 continuation: the remaining interchange formats a
  * training-data pipeline meets in the wild — zstd-compressed JSONL
  * corpus shards (F17) and Arrow IPC files (F18) — plus the data-
  * selection and tokenizer-family closers of this batch. House
  * contract as everywhere: integer/string outputs, deterministic total
  * orders, every gate a bit-exact hash compare against DuckDB; for
  * format round-trips the format layer must be invisible — the oracle
  * is the same projection in plain SQL over parquet.
  */
object QueriesR18 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // Format round-trip staging: written once per (session, dir) — the
  // format-gate memo idiom of the Delta/Iceberg/Avro round-trips.
  private val zstdMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
  private val arrowMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private val zstdSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = true),
    StructField("snippet", StringType, nullable = true),
    StructField("source_alt", StringType, nullable = true)))

  /** F17: zstd JSONL round-trip — documents written as one
    * `part-*.jsonl.zst` shard per partition through
    * [[graft.sources.ZstdJsonl]] (zstd-jni, already on Spark's
    * classpath) and read back shard-parallel with an explicit schema
    * under FAILFAST; JSON string escaping exercised by the raw text
    * snippet, null handling by a column that is NULL on every 7th doc.
    * Oracle = the same projection in plain SQL: the format layer must
    * be invisible.
    */
  def zstdJsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = zstdMemo.computeIfAbsent(
      (s.sparkContext.applicationId, dir), _ => {
        val out = java.nio.file.Files
          .createTempDirectory("graft_zstd").toString
        graft.sources.ZstdJsonl.write(
          t(s, dir, "documents")
            .select(col("doc_id"), col("source"),
              substring(col("text"), 1, 40).as("snippet"),
              when(col("doc_id") % 7 === 0, lit(null).cast("string"))
                .otherwise(col("source")).as("source_alt"))
            .repartition(4), out)
        out
      })
    graft.sources.ZstdJsonl.read(s, root, zstdSchema)
      .select(col("doc_id"), col("source"), col("snippet"), col("source_alt"))
      .orderBy(col("doc_id"))
  }

  /** F18: Arrow IPC round-trip — documents written as one Feather-v2
    * file per partition through [[graft.sources.ArrowIpc]]
    * (arrow-vector, already on Spark's classpath) and read back
    * file-parallel batch-at-a-time; nullability exercised by a column
    * that is NULL on every 5th doc. Oracle = the same projection in
    * plain SQL.
    */
  def arrowRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = arrowMemo.computeIfAbsent(
      (s.sparkContext.applicationId, dir), _ => {
        val out = java.nio.file.Files
          .createTempDirectory("graft_arrow").toString
        graft.sources.ArrowIpc.write(
          t(s, dir, "documents")
            .select(col("doc_id"), col("lang"),
              col("n_chars").cast("long").as("n_chars"),
              when(col("doc_id") % 5 === 0, lit(null).cast("string"))
                .otherwise(col("lang")).as("lang_alt"),
              // nested columns (r9): a struct and a list ride the IPC
              // file and project back flat after the read, so the hash
              // compare witnesses the nested encoding
              struct(col("lang").as("nm"),
                col("n_chars").cast("long").as("ln")).as("meta"),
              array(col("doc_id"),
                col("n_chars").cast("long")).as("arr"))
            .repartition(4), out)
        out
      })
    graft.sources.ArrowIpc.read(s, root)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("lang_alt"),
        col("meta.nm").as("meta_nm"), col("meta.ln").as("meta_ln"),
        element_at(col("arr"), 1).as("arr0"),
        element_at(col("arr"), 2).as("arr1"))
      .orderBy(col("doc_id"))
  }

  /** D23: DSIR-style data selection via importance resampling (Xie et
    * al. 2023) — the standard recipe for carving a target-domain-like
    * subset out of a huge raw corpus. Features are hashed n-grams
    * exactly as in the paper: unigrams + bigrams folded into 256
    * buckets by the house md5 hash; the target distribution here is
    * the English slice (`lang = 'en'`), the raw distribution the whole
    * corpus. Importance weight per bucket is the add-1-smoothed ratio
    * in exact ppm — (tgt+1)·10⁶ div (raw+1), the integer-exact
    * surrogate for the paper's log-likelihood ratio (monotone per
    * bucket; the float log has no cross-engine bit contract) — and a
    * document's score is the gram-count-weighted mean bucket weight.
    * `kept` flags the global top-100 under the (score desc, doc_id)
    * total order.
    *
    * Scale shape: gram→bucket is a 256-row aggregate, the weight table
    * broadcasts, per-doc scoring is one explode + one aggregate, and
    * top-100 is a bounded TakeOrdered — nothing is ever
    * corpus-quadratic and no global sort materializes.
    */
  /** Hashed-n-gram feature explode shared by the D23 batch gate and
    * its X49 streaming twin: unigrams + bigrams of `text`, folded to
    * 256 buckets by the house md5-prefix hash; `keep` columns ride
    * along.
    */
  private def dsirBuckets(df: DataFrame, keep: Seq[String]): DataFrame = {
    val toksA = filter(split(col("text"), " "), tk => tk =!= "")
    df.select(keep.map(col) :+ toksA.as("a"): _*)
      .select(keep.map(col) :+
        explode(concat(col("a"),
          zip_with(
            slice(col("a"), lit(1), greatest(size(col("a")) - 1, lit(0))),
            slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
            (x, y) => concat(x, lit(" "), y)))).as("g"): _*)
      .select(keep.map(col) :+
        pmod(graft.functions.NativeExpressions.md5_prefix24(col("g")),
          lit(256)).as("b"): _*)
  }

  /** The 256-row add-1-smoothed target/raw weight table over the whole
    * corpus (English slice = target) — broadcast by every consumer.
    */
  private def dsirWeights(s: SparkSession, dir: String): DataFrame =
    dsirBuckets(t(s, dir, "documents"), Seq("lang"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("raw_n"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tgt_n"))
      .select(col("b"),
        expr("(tgt_n + 1) * 1000000 div (raw_n + 1)").as("w_ppm"))

  def qDsirSelect(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val grams = dsirBuckets(docs, Seq("doc_id", "lang"))
    val buckets = dsirWeights(s, dir)
    val scored = grams
      .join(broadcast(buckets), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("w_ppm")).as("w_sum"))
      .select(col("doc_id"), col("n_grams"),
        expr("w_sum div n_grams").as("score_ppm"))
    val top = scored
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(100)
      .select(col("doc_id"), lit(1L).as("kept"))
    scored.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"), col("score_ppm"),
        coalesce(col("kept"), lit(0L)).as("kept"))
      .orderBy(col("doc_id"))
  }

  // One WordPiece segmentation per (SparkContext, data dir): the word
  // list is the corpus vocabulary, the result 8 ckpt'd rounds — the
  // trained-tokenizer staging idiom.
  private val wpMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  private def wpSeg(s: SparkSession, dir: String): DataFrame =
    wpMemo.computeIfAbsent((s.sparkContext.applicationId, dir), _ => {
      val words = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "").distinct()
      graft.operators.WordPiece.encode(
        words, QueriesR17.uniVocab(s, dir))
    })

  /** Force the shared WordPiece staging for this (session, dir) —
    * called by [[Bench]] before its timed loop (the stageShared idiom).
    */
  private[graft] def stageShared(s: SparkSession, dir: String): Unit = {
    wpSeg(s, dir).count(): Unit
  }

  /** T37: per-document token accounting under greedy longest-match
    * WordPiece segmentation over the trained unigram piece inventory —
    * (doc_id, n_ws whitespace tokens, n_wp WordPiece pieces); the
    * per-word piece counts are vocabulary-sized and broadcast into one
    * corpus join (the T34/T35 budget-counting contract).
    */
  def textWordpieceTokenize(s: SparkSession, dir: String): DataFrame = {
    val wpn = wpSeg(s, dir).groupBy(col("w"))
      .agg(count(lit(1)).as("n_p"))
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(wpn), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ws"), sum(col("n_p")).as("n_wp"))
      .orderBy(col("doc_id"))
  }

  /** T37: WordPiece ENCODING to token-id sequences — piece ids by rank
    * over the pieces the greedy segmentation actually uses, docs
    * explode→broadcast-join→ordered flatten; first 50 docs as
    * space-joined id strings (the T34d/T35b encode contract).
    */
  def textWordpieceEncode(s: SparkSession, dir: String): DataFrame = {
    val seg = wpSeg(s, dir)
    val vocab = seg.select(col("piece")).distinct()
      .withColumn("tid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("piece")))
        .cast("long"))
    val wseg = seg.join(vocab, Seq("piece"))
      .select(col("w"), col("pos"), col("tid"))
    t(s, dir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("wp", "w")))
      .filter(col("w") =!= "")
      .join(broadcast(wseg), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(expr(
        """array_join(transform(sort_array(collect_list(struct(wp, pos, tid))),
          |                     x -> cast(x.tid AS string)), ' ')""".stripMargin)
        .as("token_ids"))
      .orderBy(col("doc_id"))
  }

  /** M15: Netpbm binary raster decode — each row synthesizes a REAL
    * PPM (P6, odd doc_id) or PGM (P5, even) file whose header carries a
    * comment line (the token-scanner arm) and whose samples are a
    * deterministic function of doc_id, and [[graft.multimodal.Netpbm]]
    * decodes it back to the M10 pixel-statistics contract; the oracle
    * regenerates the pixels arithmetically (the M-family
    * construct→parse identity). The decoder itself is cross-validated
    * against the JDK BMP path in the spec.
    */
  def mmPnmStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
      .withColumn("w", (col("doc_id") % 5 + 3).cast("int"))
      .withColumn("h", (col("doc_id") % 4 + 2).cast("int"))
      .withColumn("ch", when(col("doc_id") % 2 === 1, 3).otherwise(1))
      .withColumn("nb", col("w") * col("h") * col("ch"))
    val header = hex(concat(
      when(col("ch") === 3, "P6").otherwise("P5"),
      lit("\n# synthetic fixture\n"),
      col("w").cast("string"), lit(" "), col("h").cast("string"),
      lit("\n255\n")))
    val samples = expr(
      """array_join(transform(sequence(0, nb - 1), k ->
        |  lpad(hex((doc_id * 11 + k * 17) % 256), 2, '0')), '')""".stripMargin)
    d.withColumn("st",
        graft.multimodal.Netpbm.pnm_stats(unhex(concat(header, samples))))
      .select(Seq(col("doc_id")) ++
        graft.multimodal.Netpbm.schema.fieldNames.map(f =>
          col(s"st.$f").as(f)): _*)
      .withColumn("channels", col("channels").cast("long"))
      .withColumn("maxval", col("maxval").cast("long"))
      .withColumn("width", col("width").cast("long"))
      .withColumn("height", col("height").cast("long"))
      .orderBy(col("doc_id"))
  }

  /** M16: TRUE baseline JPEG decode — each row synthesizes a REAL
    * baseline JFIF stream (DQT/SOF0/two DHTs/SOS + Huffman-coded
    * entropy data) whose blocks are DC-only with q₀ = 8, the one
    * regime where every conforming IDCT is bit-exact, so the oracle
    * is closed-form: block j is flat at 128 + dc_j with the
    * differential DC chain alternating +m/−m (category-6 codes,
    * byte-aligned 2-bytes-per-block by construction — the GIF-gate
    * fixture discipline). [[graft.multimodal.JpegRaster]] runs the
    * full marker walk, canonical Huffman decode, dequant, and IDCT;
    * real-Huffman/AC/stuffing arms are validated against the JDK's
    * own encoder and decoder in the spec.
    */
  def mmJpegStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
      .withColumn("bw", (col("doc_id") % 3 + 1).cast("int"))
      .withColumn("bh", (col("doc_id") % 2 + 1).cast("int"))
      .withColumn("nb", col("bw") * col("bh"))
    val be16 = (c: org.apache.spark.sql.Column) => lpad(hex(c), 4, "0")
    val header = concat(
      lit("FFD8"),
      lit("FFDB0043" + "00" + "08" + "10" * 63),
      lit("FFC0000B08"), be16(col("bh") * 8), be16(col("bw") * 8),
      lit("01011100"),
      lit("FFC40014" + "00" + "0001" + "00" * 14 + "06"),
      lit("FFC40014" + "10" + "00" * 7 + "01" + "00" * 8 + "00"),
      lit("FFDA00080101000" + "03F00"))
    val data = expr(
      """array_join(transform(sequence(0, nb - 1), j ->
        |  concat(lpad(hex(CASE WHEN j % 2 = 0
        |                       THEN 32 + (doc_id + j div 2) % 16
        |                       ELSE 63 - (32 + (doc_id + (j - 1) div 2) % 16)
        |                  END), 2, '0'), '00')), '')""".stripMargin)
    d.withColumn("st", graft.multimodal.JpegRaster.jpeg_stats(
        unhex(concat(header, data, lit("FFD9")))))
      .select(Seq(col("doc_id")) ++
        graft.multimodal.JpegRaster.schema.fieldNames.map(f =>
          col(s"st.$f").as(f)): _*)
      .withColumn("channels", col("channels").cast("long"))
      .withColumn("width", col("width").cast("long"))
      .withColumn("height", col("height").cast("long"))
      .orderBy(col("doc_id"))
  }

  /** X49: streaming DSIR importance-mass monitor — D23 live: documents
    * ride the bus as JSON, each micro-batch's hashed n-grams join the
    * broadcast 256-row weight table (stream-static enrichment, the X45
    * posture), and per-source (n_grams, w_sum) totals accumulate from
    * order-independent sums — the feed-health view of "how much
    * target-like mass is arriving per source".
    */
  def streamDsirMass(s: SparkSession, dir: String): DataFrame = {
    val weights = broadcast(dsirWeights(s, dir))
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("graft_busdsir").toString
    graft.streaming.BusSource.stage(
      d.select(pmod(hash(col("doc_id")), lit(4)).as("pt"),
        to_json(struct(col("source"), col("text"))).as("v"), col("doc_id")),
      root, busPartitions = 4, pt = col("pt"), value = col("v"),
      col("doc_id"))
    val trigger = math.max(100L, d.count() / 8)
    graft.streaming.Streams.busReplay(s, root, maxRowsPerTrigger = trigger,
        s"gate_busdsir_${System.nanoTime()}") { stream =>
      val parsed = stream.select(from_json(col("value"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "source STRING, text STRING")).as("e"))
        .select(col("e.source").as("source"), col("e.text").as("text"))
      dsirBuckets(parsed, Seq("source"))
        .join(weights, Seq("b"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_grams"), sum(col("w_ppm")).as("w_sum"))
    }.orderBy(col("source"))
  }

  /** X50: streaming WordPiece token monitor — X46's twin for the third
    * tokenizer family: the broadcast vocabulary-sized per-word piece
    * counts from the greedy segmentation join each micro-batch, per
    * source (whitespace, WordPiece) totals ≡ the batch report.
    */
  def streamWordpieceTokens(s: SparkSession, dir: String): DataFrame = {
    val wpn = broadcast(wpSeg(s, dir).groupBy(col("w"))
      .agg(count(lit(1)).as("n_p")))
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("graft_buswp").toString
    graft.streaming.BusSource.stage(
      d.select(pmod(hash(col("doc_id")), lit(4)).as("pt"),
        to_json(struct(col("source"), col("text"))).as("v"), col("doc_id")),
      root, busPartitions = 4, pt = col("pt"), value = col("v"),
      col("doc_id"))
    val trigger = math.max(100L, d.count() / 8)
    graft.streaming.Streams.busReplay(s, root, maxRowsPerTrigger = trigger,
        s"gate_buswp_${System.nanoTime()}") { stream =>
      stream.select(from_json(col("value"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "source STRING, text STRING")).as("e"))
        .select(col("e.source").as("source"),
          explode(split(col("e.text"), " ")).as("w"))
        .join(wpn, Seq("w"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_ws"), sum(col("n_p")).as("n_wp"))
    }.orderBy(col("source"))
  }

  /** Little-endian hex of a (small, non-negative) integer column over
    * `nBytes` bytes — the M-family fixture-construction helper (the
    * QueriesR17 idiom, restated locally).
    */
  private def le(v: org.apache.spark.sql.Column, nBytes: Int)
      : org.apache.spark.sql.Column =
    concat((0 until nBytes).map(i =>
      lpad(hex(pmod(v.cast("long") / (1L << (8 * i)), lit(256)).cast("int")),
        2, "0")): _*)

  /** One little-endian IFD entry: tag, type, count, inline value. */
  private def ifdEntry(tag: Int, typ: Int, count: Int,
      value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(le(lit(tag), 2), le(lit(typ), 2), le(lit(count), 4), le(value, 4))

  /** M17: TIFF baseline decode — each row synthesizes a REAL
    * little-endian TIFF (header, 9-entry IFD with SHORT/LONG types and
    * the inline-vs-offset value rule, single strip) — grayscale
    * BlackIsZero for even doc_id, RGB with an out-of-line
    * BitsPerSample array for odd — and [[graft.multimodal.TiffRaster]]
    * walks it back to the M10 statistics; the oracle regenerates the
    * pixels arithmetically. Big-endian, multi-strip, WhiteIsZero, and
    * the external-encoder EXACT round-trip live in the spec.
    */
  def mmTiffStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
      .withColumn("w", (col("doc_id") % 4 + 2).cast("int"))
      .withColumn("h", (col("doc_id") % 3 + 1).cast("int"))
      .withColumn("spp", when(col("doc_id") % 2 === 1, 3).otherwise(1))
      .withColumn("nb", col("w") * col("h") * col("spp"))
    val header = concat(lit("49492A00"), le(lit(8), 4), le(lit(9), 2))
    val gray = concat(
      ifdEntry(256, 3, 1, col("w")), ifdEntry(257, 3, 1, col("h")),
      ifdEntry(258, 3, 1, lit(8)), ifdEntry(259, 3, 1, lit(1)),
      ifdEntry(262, 3, 1, lit(1)), ifdEntry(273, 4, 1, lit(122)),
      ifdEntry(277, 3, 1, lit(1)), ifdEntry(278, 3, 1, col("h")),
      ifdEntry(279, 4, 1, col("w") * col("h")), le(lit(0), 4))
    val rgb = concat(
      ifdEntry(256, 3, 1, col("w")), ifdEntry(257, 3, 1, col("h")),
      ifdEntry(258, 3, 3, lit(122)), ifdEntry(259, 3, 1, lit(1)),
      ifdEntry(262, 3, 1, lit(2)), ifdEntry(273, 4, 1, lit(128)),
      ifdEntry(277, 3, 1, lit(3)), ifdEntry(278, 3, 1, col("h")),
      ifdEntry(279, 4, 1, col("nb")), le(lit(0), 4),
      lit("080008000800"))
    val pixels = expr(
      """array_join(transform(sequence(0, nb - 1), k ->
        |  lpad(hex((doc_id * 13 + k * 29) % 256), 2, '0')), '')""".stripMargin)
    val payload = unhex(concat(header,
      when(col("spp") === 3, rgb).otherwise(gray), pixels))
    d.withColumn("st", graft.multimodal.TiffRaster.tiff_stats(payload))
      .select(Seq(col("doc_id")) ++
        graft.multimodal.TiffRaster.schema.fieldNames.map(f =>
          col(s"st.$f").as(f)): _*)
      .withColumn("channels", col("channels").cast("long"))
      .withColumn("width", col("width").cast("long"))
      .withColumn("height", col("height").cast("long"))
      .orderBy(col("doc_id"))
  }

  /** M17b (r9): PackBits-COMPRESSED TIFF decode — each row synthesizes
    * a real little-endian TIFF whose single strip is PackBits-encoded
    * (per raster row: one literal-run header byte then the row's
    * samples — RLE structure the engine must actually walk, with
    * StripByteCounts = h·(w+1) ≠ the raster size), decoded back to the
    * M10 statistics; the oracle regenerates the pixels arithmetically.
    * The repeat-run arm, LZW, Deflate, and palette TIFFs round-trip
    * against the JDK's own encoder in the spec (RLE of equal bytes is
    * not SQL-constructible per-row; the literal arm is).
    */
  def mmTiffPackbitsStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
      .withColumn("w", (col("doc_id") % 5 + 2).cast("int"))
      .withColumn("h", (col("doc_id") % 3 + 1).cast("int"))
    val header = concat(lit("49492A00"), le(lit(8), 4), le(lit(9), 2))
    val ifd = concat(
      ifdEntry(256, 3, 1, col("w")), ifdEntry(257, 3, 1, col("h")),
      ifdEntry(258, 3, 1, lit(8)), ifdEntry(259, 3, 1, lit(32773)),
      ifdEntry(262, 3, 1, lit(1)), ifdEntry(273, 4, 1, lit(122)),
      ifdEntry(277, 3, 1, lit(1)), ifdEntry(278, 3, 1, col("h")),
      ifdEntry(279, 4, 1, col("h") * (col("w") + 1)), le(lit(0), 4))
    val packed = expr(
      """array_join(transform(sequence(0, h - 1), r ->
        |  concat(lpad(hex(w - 1), 2, '0'),
        |    array_join(transform(sequence(0, w - 1), k ->
        |      lpad(hex((doc_id * 17 + (r * w + k) * 23) % 256), 2, '0')),
        |      ''))), '')""".stripMargin)
    val payload = unhex(concat(header, ifd, packed))
    d.withColumn("st", graft.multimodal.TiffRaster.tiff_stats(payload))
      .select(Seq(col("doc_id")) ++
        graft.multimodal.TiffRaster.schema.fieldNames.map(f =>
          col(s"st.$f").as(f)): _*)
      .withColumn("channels", col("channels").cast("long"))
      .withColumn("width", col("width").cast("long"))
      .withColumn("height", col("height").cast("long"))
      .orderBy(col("doc_id"))
  }

  /** M17c (r10): TILED TIFF decode — each row synthesizes a real
    * little-endian tiled TIFF (tags 322/323/324/325, one 16×16 tile —
    * the spec's minimum tile dims — holding a w×h raster with
    * right/bottom PADDING, the GIS/microscopy organization) and
    * [[graft.multimodal.TiffRaster]] assembles it back to the M10
    * statistics; the oracle regenerates only the VALID pixels, so a
    * decoder that leaks tile padding into the sums hash-fails.
    * Multi-tile grids, compressed tiles, and the JDK-encoder
    * round-trip live in the spec.
    */
  def mmTiffTiledStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"))
      .withColumn("w", (col("doc_id") % 4 + 2).cast("int"))
      .withColumn("h", (col("doc_id") % 3 + 1).cast("int"))
    val header = concat(lit("49492A00"), le(lit(8), 4), le(lit(10), 2))
    val ifd = concat(
      ifdEntry(256, 3, 1, col("w")), ifdEntry(257, 3, 1, col("h")),
      ifdEntry(258, 3, 1, lit(8)), ifdEntry(259, 3, 1, lit(1)),
      ifdEntry(262, 3, 1, lit(1)), ifdEntry(277, 3, 1, lit(1)),
      ifdEntry(322, 3, 1, lit(16)), ifdEntry(323, 3, 1, lit(16)),
      ifdEntry(324, 4, 1, lit(134)), ifdEntry(325, 4, 1, lit(256)),
      le(lit(0), 4))
    // 16×16 tile buffer: valid pixels where col < w AND row < h,
    // zero padding elsewhere (must never reach the statistics)
    val tile = expr(
      """array_join(transform(sequence(0, 255), k ->
        |  lpad(hex(CASE WHEN k % 16 < w AND k div 16 < h
        |    THEN (doc_id * 7 + (k div 16) * w + (k % 16) * 19) % 256
        |    ELSE 0 END), 2, '0')), '')""".stripMargin)
    val payload = unhex(concat(header, ifd, tile))
    d.withColumn("st", graft.multimodal.TiffRaster.tiff_stats(payload))
      .select(Seq(col("doc_id")) ++
        graft.multimodal.TiffRaster.schema.fieldNames.map(f =>
          col(s"st.$f").as(f)): _*)
      .withColumn("channels", col("channels").cast("long"))
      .withColumn("width", col("width").cast("long"))
      .withColumn("height", col("height").cast("long"))
      .orderBy(col("doc_id"))
  }

  /** D24: content-defined chunking dedup — the storage-grade dedup
    * family (Manber 1994 fingerprint landmarks, the ancestor of
    * LBFS/FastCDC): chunk boundaries fall where an 8-char polynomial
    * rolling hash (base 31, mod 2²⁴) lands on a 1-in-64 landmark, so
    * INSERTIONS SHIFT BYTES BUT NOT DOWNSTREAM BOUNDARIES — the
    * property positional (fixed-size) chunking lacks and the reason
    * every backup/dedup store uses CDC. Chunks are md5-keyed; a chunk
    * occurring in ≥ 2 documents is a duplicate. Report: per source,
    * chunk count, duplicate-chunk occurrences, dup share in exact ppm
    * — the corpus-health view of cross-document boilerplate at the
    * byte level (D21's repeated-span sibling, content-defined instead
    * of token-window). Stated simplification: pure landmark cuts (no
    * min/max chunk clamps — those need sequential state; the landmark
    * density 1/64 bounds expected chunk size instead).
    *
    * Scale shape (r10): the position walk is ONE native codegen
    * expression per document ([[graft.functions.CdcLandmarks]] — the
    * rolling-hash machinery of T4/F13) emitting the landmark-position
    * array, so only BOUNDARIES explode into rows (~1/64 of characters)
    * instead of one in-pipeline row per character with an 8-term
    * interpreted lambda each (the r9 verdict's efficiency finding:
    * ~10× constant). Chunk extraction is a window lag + substring, and
    * the duplicate report is two hash-keyed aggregates — never
    * doc-pair-quadratic. Arithmetic unchanged: same polynomial, same
    * single mod, hash-identical output.
    */
  def dedupCdcChunks(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        length(col("text")).as("len"))
    val cuts = docs
      .filter(col("len") >= 8) // shorter docs are a single chunk
      .select(col("doc_id"), col("source"), col("text"), col("len"),
        explode(graft.functions.NativeExpressions.cdc_landmarks(col("text")))
          .as("i"))
      .unionByName(docs.select(col("doc_id"), col("source"), col("text"),
        col("len"), col("len").as("i")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val chunks = cuts
      .withColumn("start", coalesce(lag(col("i"), 1).over(win), lit(0L)) + 1)
      .withColumn("chunk_md5",
        md5(expr("substring(text, start, i - start + 1)")))
      .select(col("doc_id"), col("source"), col("chunk_md5"))
    val dupSet = chunks.groupBy(col("chunk_md5"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("chunk_md5"))
    chunks.join(dupSet, Seq("chunk_md5"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_dup"))
      .join(chunks.groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks")), Seq("source"), "right")
      .select(col("source"), col("n_chunks"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_ppm", expr("n_dup * 1000000 div n_chunks"))
      .orderBy(col("source"))
  }

  /** Mixed raster payloads, one format per doc_id residue class: the
    * M15 PNM (doc_id ≡ 0 mod 3), M17 TIFF (≡ 1), and M16 JPEG (≡ 2)
    * gate fixtures verbatim — the X51 staging input.
    */
  private def mmMixedPayloads(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"))
    val pnm = {
      val d = base.filter(col("doc_id") % 3 === 0)
        .withColumn("w", (col("doc_id") % 5 + 3).cast("int"))
        .withColumn("h", (col("doc_id") % 4 + 2).cast("int"))
        .withColumn("ch", when(col("doc_id") % 2 === 1, 3).otherwise(1))
        .withColumn("nb", col("w") * col("h") * col("ch"))
      val header = hex(concat(
        when(col("ch") === 3, "P6").otherwise("P5"),
        lit("\n# synthetic fixture\n"),
        col("w").cast("string"), lit(" "), col("h").cast("string"),
        lit("\n255\n")))
      val samples = expr(
        """array_join(transform(sequence(0, nb - 1), k ->
          |  lpad(hex((doc_id * 11 + k * 17) % 256), 2, '0')), '')""".stripMargin)
      d.select(col("doc_id"), unhex(concat(header, samples)).as("payload"))
    }
    val tiff = {
      val d = base.filter(col("doc_id") % 3 === 1)
        .withColumn("w", (col("doc_id") % 4 + 2).cast("int"))
        .withColumn("h", (col("doc_id") % 3 + 1).cast("int"))
        .withColumn("spp", when(col("doc_id") % 2 === 1, 3).otherwise(1))
        .withColumn("nb", col("w") * col("h") * col("spp"))
      val header = concat(lit("49492A00"), le(lit(8), 4), le(lit(9), 2))
      val gray = concat(
        ifdEntry(256, 3, 1, col("w")), ifdEntry(257, 3, 1, col("h")),
        ifdEntry(258, 3, 1, lit(8)), ifdEntry(259, 3, 1, lit(1)),
        ifdEntry(262, 3, 1, lit(1)), ifdEntry(273, 4, 1, lit(122)),
        ifdEntry(277, 3, 1, lit(1)), ifdEntry(278, 3, 1, col("h")),
        ifdEntry(279, 4, 1, col("w") * col("h")), le(lit(0), 4))
      val rgb = concat(
        ifdEntry(256, 3, 1, col("w")), ifdEntry(257, 3, 1, col("h")),
        ifdEntry(258, 3, 3, lit(122)), ifdEntry(259, 3, 1, lit(1)),
        ifdEntry(262, 3, 1, lit(2)), ifdEntry(273, 4, 1, lit(128)),
        ifdEntry(277, 3, 1, lit(3)), ifdEntry(278, 3, 1, col("h")),
        ifdEntry(279, 4, 1, col("nb")), le(lit(0), 4),
        lit("080008000800"))
      val pixels = expr(
        """array_join(transform(sequence(0, nb - 1), k ->
          |  lpad(hex((doc_id * 13 + k * 29) % 256), 2, '0')), '')""".stripMargin)
      d.select(col("doc_id"), unhex(concat(header,
        when(col("spp") === 3, rgb).otherwise(gray), pixels)).as("payload"))
    }
    val jpeg = {
      val d = base.filter(col("doc_id") % 3 === 2)
        .withColumn("bw", (col("doc_id") % 3 + 1).cast("int"))
        .withColumn("bh", (col("doc_id") % 2 + 1).cast("int"))
        .withColumn("nb", col("bw") * col("bh"))
      val be16 = (c: org.apache.spark.sql.Column) => lpad(hex(c), 4, "0")
      val header = concat(
        lit("FFD8"),
        lit("FFDB0043" + "00" + "08" + "10" * 63),
        lit("FFC0000B08"), be16(col("bh") * 8), be16(col("bw") * 8),
        lit("01011100"),
        lit("FFC40014" + "00" + "0001" + "00" * 14 + "06"),
        lit("FFC40014" + "10" + "00" * 7 + "01" + "00" * 8 + "00"),
        lit("FFDA00080101000" + "03F00"))
      val data = expr(
        """array_join(transform(sequence(0, nb - 1), j ->
          |  concat(lpad(hex(CASE WHEN j % 2 = 0
          |                       THEN 32 + (doc_id + j div 2) % 16
          |                       ELSE 63 - (32 + (doc_id + (j - 1) div 2) % 16)
          |                  END), 2, '0'), '00')), '')""".stripMargin)
      d.select(col("doc_id"),
        unhex(concat(header, data, lit("FFD9"))).as("payload"))
    }
    pnm.unionByName(tiff).unionByName(jpeg)
  }

  /** X51: streaming multimodal decode dispatch — MIXED binary payloads
    * (PNM, TIFF, JPEG) ride the bus base64-encoded; every micro-batch
    * sniffs each payload's magic bytes and routes it to the right
    * native decoder, and per-format (n_files, n_px, sum_r) totals
    * accumulate from order-independent sums — the sniff→decode
    * dispatch of a real ingest feed, live. The decoders are the M15/
    * M16/M17 expressions unchanged, composed by their reject-by-null
    * contract: every decoder sees every payload but nulls out foreign
    * magics at the first header check, so coalesce picks the one that
    * accepted it.
    */
  def streamMmDecode(s: SparkSession, dir: String): DataFrame = {
    val d = mmMixedPayloads(s, dir)
    val root = java.nio.file.Files.createTempDirectory("graft_busmm").toString
    graft.streaming.BusSource.stage(
      d.select(pmod(hash(col("doc_id")), lit(4)).as("pt"),
        to_json(struct(col("doc_id"),
          base64(col("payload")).as("b64"))).as("v"), col("doc_id")),
      root, busPartitions = 4, pt = col("pt"), value = col("v"),
      col("doc_id"))
    val trigger = math.max(100L, d.count() / 8)
    graft.streaming.Streams.busReplay(s, root, maxRowsPerTrigger = trigger,
        s"gate_busmm_${System.nanoTime()}") { stream =>
      val p = stream.select(from_json(col("value"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, b64 STRING")).as("e"))
        .select(unbase64(col("e.b64")).as("payload"))
        .withColumn("magic", hex(expr("substring(payload, 1, 2)")))
        .withColumn("fmt",
          when(col("magic").isin("5035", "5036"), "pnm")
            .when(col("magic").isin("4949", "4D4D"), "tiff")
            .when(col("magic") === "FFD8", "jpeg")
            .otherwise("unknown"))
      p.withColumn("pnm_st", graft.multimodal.Netpbm.pnm_stats(col("payload")))
        .withColumn("tiff_st", graft.multimodal.TiffRaster.tiff_stats(col("payload")))
        .withColumn("jpeg_st", graft.multimodal.JpegRaster.jpeg_stats(col("payload")))
        .withColumn("n_px", coalesce(col("pnm_st.n_px"),
          col("tiff_st.n_px"), col("jpeg_st.n_px")))
        .withColumn("sr", coalesce(col("pnm_st.sum_r"),
          col("tiff_st.sum_r"), col("jpeg_st.sum_r")))
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n_files"), sum(col("n_px")).as("n_px"),
          sum(col("sr")).as("sum_r"))
    }.orderBy(col("fmt"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_mm_decode" -> (streamMmDecode _),
    "dedup_cdc_chunks" -> (dedupCdcChunks _),
    "mm_tiff_stats" -> (mmTiffStats _),
    "mm_tiff_packbits_stats" -> (mmTiffPackbitsStats _),
    "mm_tiff_tiled_stats" -> (mmTiffTiledStats _),
    "stream_dsir_mass" -> (streamDsirMass _),
    "stream_wordpiece_tokens" -> (streamWordpieceTokens _),
    "mm_jpeg_stats" -> (mmJpegStats _),
    "mm_pnm_stats" -> (mmPnmStats _),
    "zstd_jsonl_roundtrip" -> (zstdJsonlRoundtrip _),
    "arrow_roundtrip" -> (arrowRoundtrip _),
    "q_dsir_select" -> (qDsirSelect _),
    "text_wordpiece_tokenize" -> (textWordpieceTokenize _),
    "text_wordpiece_encode" -> (textWordpieceEncode _))

  // DuckDB-side md5-prefix-24 (mirrors Spark's conv(substr(md5,1,6),16,10)
  // native expression) — the QueriesData idiom, restated locally.
  private def hex6ToInt(sExpr: String): String =
    (1 to 6).map { i =>
      val p = math.pow(16, 6 - i).toLong
      s"(strpos('0123456789abcdef', substr($sExpr, $i, 1)) - 1) * $p"
    }.mkString("(", " + ", ")")

  val sql: Map[String, String] = Map(
    "stream_mm_decode" ->
      """WITH pn AS (
        |  SELECT doc_id, doc_id % 5 + 3 AS w, doc_id % 4 + 2 AS h,
        |         CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END AS ch
        |  FROM documents WHERE doc_id % 3 = 0
        |), pnx AS (
        |  SELECT doc_id, COUNT(*) AS npx,
        |    SUM(CASE WHEN ch = 3 THEN (doc_id*11 + (3*p)*17) % 256
        |             ELSE (doc_id*11 + p*17) % 256 END) AS sr
        |  FROM (SELECT doc_id, ch,
        |          unnest(generate_series(0, w * h - 1)) AS p FROM pn)
        |  GROUP BY doc_id
        |), tf AS (
        |  SELECT doc_id, doc_id % 4 + 2 AS w, doc_id % 3 + 1 AS h,
        |         CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END AS ch
        |  FROM documents WHERE doc_id % 3 = 1
        |), tfx AS (
        |  SELECT doc_id, COUNT(*) AS npx,
        |    SUM(CASE WHEN ch = 3 THEN (doc_id*13 + (3*p)*29) % 256
        |             ELSE (doc_id*13 + p*29) % 256 END) AS sr
        |  FROM (SELECT doc_id, ch,
        |          unnest(generate_series(0, w * h - 1)) AS p FROM tf)
        |  GROUP BY doc_id
        |), jp AS (
        |  SELECT doc_id, doc_id % 3 + 1 AS bw, doc_id % 2 + 1 AS bh
        |  FROM documents WHERE doc_id % 3 = 2
        |), jpx AS (
        |  SELECT doc_id, 64 * COUNT(*) AS npx,
        |    64 * SUM(128 + CASE WHEN j % 2 = 0
        |             THEN 32 + (doc_id + j // 2) % 16 ELSE 0 END) AS sr
        |  FROM (SELECT doc_id,
        |          unnest(generate_series(0, bw * bh - 1)) AS j FROM jp)
        |  GROUP BY doc_id
        |)
        |SELECT fmt, n_files, n_px, sum_r FROM (
        |  SELECT 'pnm' AS fmt, COUNT(*) AS n_files,
        |    CAST(SUM(npx) AS BIGINT) AS n_px,
        |    CAST(SUM(sr) AS BIGINT) AS sum_r FROM pnx
        |  UNION ALL
        |  SELECT 'tiff', COUNT(*), CAST(SUM(npx) AS BIGINT),
        |    CAST(SUM(sr) AS BIGINT) FROM tfx
        |  UNION ALL
        |  SELECT 'jpeg', COUNT(*), CAST(SUM(npx) AS BIGINT),
        |    CAST(SUM(sr) AS BIGINT) FROM jpx
        |) ORDER BY fmt""".stripMargin,
    "dedup_cdc_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, source, text, length(text) AS len FROM documents
        |), lm AS (
        |  SELECT doc_id, source, text, len, i
        |  FROM (SELECT doc_id, source, text, len,
        |          unnest(generate_series(8, len)) AS i
        |        FROM d WHERE len >= 8)
        |  WHERE list_sum(list_transform(range(0, 8),
        |          k -> ascii(substr(text, CAST(i - k AS INTEGER), 1)) *
        |               ([1, 31, 961, 29791, 923521, 28629151, 887503681,
        |                 27512614111])[k + 1]))
        |        % 16777216 % 64 = 0
        |    AND i < len
        |), cuts AS (
        |  SELECT doc_id, source, text, i FROM lm
        |  UNION ALL
        |  SELECT doc_id, source, text, len AS i FROM d
        |), ch AS (
        |  SELECT doc_id, source,
        |    md5(substr(text,
        |      CAST(COALESCE(LAG(i) OVER w, 0) + 1 AS INTEGER),
        |      CAST(i - COALESCE(LAG(i) OVER w, 0) AS INTEGER))) AS chunk_md5
        |  FROM cuts
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
        |), dup AS (
        |  SELECT chunk_md5 FROM ch
        |  GROUP BY chunk_md5 HAVING COUNT(DISTINCT doc_id) >= 2
        |)
        |SELECT c.source, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN p.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dup,
        |  CAST(SUM(CASE WHEN p.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END)
        |    * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm
        |FROM ch c LEFT JOIN dup p USING (chunk_md5)
        |GROUP BY c.source ORDER BY c.source""".stripMargin,
    "mm_tiff_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 4 + 2 AS w, doc_id % 3 + 1 AS h,
        |         CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END AS ch
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, p,
        |    CASE WHEN ch = 3 THEN (doc_id*13 + (3*p)*29) % 256
        |         ELSE (doc_id*13 + p*29) % 256 END AS r,
        |    CASE WHEN ch = 3 THEN (doc_id*13 + (3*p + 1)*29) % 256
        |         ELSE (doc_id*13 + p*29) % 256 END AS g,
        |    CASE WHEN ch = 3 THEN (doc_id*13 + (3*p + 2)*29) % 256
        |         ELSE (doc_id*13 + p*29) % 256 END AS b
        |  FROM (SELECT doc_id, ch,
        |          unnest(generate_series(0, w * h - 1)) AS p FROM dims)
        |), lum AS (
        |  SELECT doc_id, r, g, b,
        |         CASE WHEN (299*r + 587*g + 114*b) // 31875 > 7 THEN 7
        |              ELSE (299*r + 587*g + 114*b) // 31875 END AS bk
        |  FROM px
        |)
        |SELECT d.doc_id, CAST(d.ch AS BIGINT) AS channels,
        |  CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
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
        |GROUP BY d.doc_id, d.ch, d.w, d.h
        |ORDER BY d.doc_id""".stripMargin,
    "mm_tiff_tiled_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 4 + 2 AS w, doc_id % 3 + 1 AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, (doc_id*7 + r*w + c*19) % 256 AS v
        |  FROM (SELECT doc_id, w,
        |          unnest(generate_series(0, h - 1)) AS r FROM dims),
        |       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS c)
        |), lum AS (
        |  SELECT doc_id, v,
        |         CASE WHEN (299*v + 587*v + 114*v) // 31875 > 7 THEN 7
        |              ELSE (299*v + 587*v + 114*v) // 31875 END AS bk
        |  FROM px
        |)
        |SELECT d.doc_id, CAST(1 AS BIGINT) AS channels,
        |  CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
        |  CAST(d.w * d.h AS BIGINT) AS n_px,
        |  CAST(SUM(l.v) AS BIGINT) AS sum_r,
        |  CAST(SUM(l.v) AS BIGINT) AS sum_g,
        |  CAST(SUM(l.v) AS BIGINT) AS sum_b,
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
    "mm_tiff_packbits_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 5 + 2 AS w, doc_id % 3 + 1 AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, (doc_id*17 + p*23) % 256 AS v
        |  FROM (SELECT doc_id,
        |          unnest(generate_series(0, w * h - 1)) AS p FROM dims)
        |), lum AS (
        |  SELECT doc_id, v,
        |         CASE WHEN (299*v + 587*v + 114*v) // 31875 > 7 THEN 7
        |              ELSE (299*v + 587*v + 114*v) // 31875 END AS bk
        |  FROM px
        |)
        |SELECT d.doc_id, CAST(1 AS BIGINT) AS channels,
        |  CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
        |  CAST(d.w * d.h AS BIGINT) AS n_px,
        |  CAST(SUM(l.v) AS BIGINT) AS sum_r,
        |  CAST(SUM(l.v) AS BIGINT) AS sum_g,
        |  CAST(SUM(l.v) AS BIGINT) AS sum_b,
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
    "stream_dsir_mass" ->
      s"""WITH dt AS (
         |  SELECT source, lang,
         |         list_filter(str_split(text, ' '), t -> t <> '') AS a
         |  FROM documents
         |), gr AS (
         |  SELECT source, lang, unnest(a) AS g FROM dt
         |  UNION ALL
         |  SELECT source, lang,
         |         unnest(list_transform(range(1, len(a)),
         |                i -> a[i] || ' ' || a[i + 1])) AS g
         |  FROM dt
         |), gb AS (
         |  SELECT source, lang, ${hex6ToInt("md5(g)")} % 256 AS b FROM gr
         |), bw AS (
         |  SELECT b,
         |    CAST((SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1)
         |         * 1000000 // (COUNT(*) + 1) AS BIGINT) AS w_ppm
         |  FROM gb GROUP BY b
         |)
         |SELECT source, COUNT(*) AS n_grams,
         |       CAST(SUM(w_ppm) AS BIGINT) AS w_sum
         |FROM gb JOIN bw USING (b)
         |GROUP BY source ORDER BY source""".stripMargin,
    "stream_wordpiece_tokens" ->
      s"""WITH ${graft.operators.Unigram.oracleCtes("documents", "text")},
         |${graft.operators.WordPiece.segOracleCtes},
         |wpn AS MATERIALIZED (
         |  SELECT w, COUNT(*) AS n_p FROM wpseg GROUP BY w
         |),
         |dw AS (
         |  SELECT source, w FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS w
         |    FROM documents
         |  ) WHERE w <> ''
         |)
         |SELECT source, COUNT(*) AS n_ws, CAST(SUM(n_p) AS BIGINT) AS n_wp
         |FROM dw JOIN wpn USING (w)
         |GROUP BY source ORDER BY source""".stripMargin,
    "mm_jpeg_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 3 + 1 AS bw, doc_id % 2 + 1 AS bh
        |  FROM documents
        |), blocks AS (
        |  SELECT doc_id,
        |    128 + CASE WHEN j % 2 = 0
        |               THEN 32 + (doc_id + j // 2) % 16 ELSE 0 END AS v
        |  FROM (SELECT doc_id,
        |          unnest(generate_series(0, bw * bh - 1)) AS j FROM dims)
        |), bl AS (
        |  SELECT doc_id, v,
        |         CASE WHEN (1000 * v) // 31875 > 7 THEN 7
        |              ELSE (1000 * v) // 31875 END AS bk
        |  FROM blocks
        |)
        |SELECT d.doc_id, CAST(1 AS BIGINT) AS channels,
        |  CAST(8 * d.bw AS BIGINT) AS width,
        |  CAST(8 * d.bh AS BIGINT) AS height,
        |  CAST(64 * d.bw * d.bh AS BIGINT) AS n_px,
        |  CAST(64 * SUM(v) AS BIGINT) AS sum_r,
        |  CAST(64 * SUM(v) AS BIGINT) AS sum_g,
        |  CAST(64 * SUM(v) AS BIGINT) AS sum_b,
        |  CAST(64 * SUM(CASE WHEN bk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
        |  CAST(64 * SUM(CASE WHEN bk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
        |  CAST(64 * SUM(CASE WHEN bk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
        |  CAST(64 * SUM(CASE WHEN bk = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3,
        |  CAST(64 * SUM(CASE WHEN bk = 4 THEN 1 ELSE 0 END) AS BIGINT) AS h4,
        |  CAST(64 * SUM(CASE WHEN bk = 5 THEN 1 ELSE 0 END) AS BIGINT) AS h5,
        |  CAST(64 * SUM(CASE WHEN bk = 6 THEN 1 ELSE 0 END) AS BIGINT) AS h6,
        |  CAST(64 * SUM(CASE WHEN bk = 7 THEN 1 ELSE 0 END) AS BIGINT) AS h7
        |FROM dims d JOIN bl USING (doc_id)
        |GROUP BY d.doc_id, d.bw, d.bh
        |ORDER BY d.doc_id""".stripMargin,
    "mm_pnm_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 5 + 3 AS w, doc_id % 4 + 2 AS h,
        |         CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END AS ch
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, p,
        |    CASE WHEN ch = 3 THEN (doc_id*11 + (3*p)*17) % 256
        |         ELSE (doc_id*11 + p*17) % 256 END AS r,
        |    CASE WHEN ch = 3 THEN (doc_id*11 + (3*p + 1)*17) % 256
        |         ELSE (doc_id*11 + p*17) % 256 END AS g,
        |    CASE WHEN ch = 3 THEN (doc_id*11 + (3*p + 2)*17) % 256
        |         ELSE (doc_id*11 + p*17) % 256 END AS b
        |  FROM (SELECT doc_id, ch,
        |          unnest(generate_series(0, w * h - 1)) AS p FROM dims)
        |), lum AS (
        |  SELECT doc_id, r, g, b,
        |         CASE WHEN (299*r + 587*g + 114*b) // 31875 > 7 THEN 7
        |              ELSE (299*r + 587*g + 114*b) // 31875 END AS bk
        |  FROM px
        |)
        |SELECT d.doc_id, CAST(d.ch AS BIGINT) AS channels,
        |  CAST(255 AS BIGINT) AS maxval,
        |  CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
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
        |GROUP BY d.doc_id, d.ch, d.w, d.h
        |ORDER BY d.doc_id""".stripMargin,
    "text_wordpiece_tokenize" ->
      s"""WITH ${graft.operators.Unigram.oracleCtes("documents", "text")},
         |${graft.operators.WordPiece.segOracleCtes},
         |wpn AS MATERIALIZED (
         |  SELECT w, COUNT(*) AS n_p FROM wpseg GROUP BY w
         |),
         |dw AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |    FROM documents
         |  ) WHERE w <> ''
         |)
         |SELECT doc_id, COUNT(*) AS n_ws, CAST(SUM(n_p) AS BIGINT) AS n_wp
         |FROM dw JOIN wpn USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_wordpiece_encode" ->
      s"""WITH ${graft.operators.Unigram.oracleCtes("documents", "text")},
         |${graft.operators.WordPiece.segOracleCtes},
         |vocabw AS MATERIALIZED (
         |  SELECT piece,
         |         CAST(ROW_NUMBER() OVER (ORDER BY piece) AS BIGINT) AS tid
         |  FROM (SELECT DISTINCT piece FROM wpseg)
         |), wsegw AS MATERIALIZED (
         |  SELECT w, pos, tid FROM wpseg JOIN vocabw USING (piece)
         |), dw AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS wp, w FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         |           generate_subscripts(string_split(text, ' '), 1) AS i
         |    FROM documents WHERE doc_id < 50
         |  ) WHERE w <> ''
         |)
         |SELECT doc_id,
         |  string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY wp, pos) AS token_ids
         |FROM dw JOIN wsegw USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dsir_select" ->
      s"""WITH dt AS (
         |  SELECT doc_id, lang,
         |         list_filter(str_split(text, ' '), t -> t <> '') AS a
         |  FROM documents
         |), gr AS (
         |  SELECT doc_id, lang, unnest(a) AS g FROM dt
         |  UNION ALL
         |  SELECT doc_id, lang,
         |         unnest(list_transform(range(1, len(a)),
         |                i -> a[i] || ' ' || a[i + 1])) AS g
         |  FROM dt
         |), gb AS (
         |  SELECT doc_id, lang, ${hex6ToInt("md5(g)")} % 256 AS b FROM gr
         |), bw AS (
         |  SELECT b,
         |    CAST((SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1)
         |         * 1000000 // (COUNT(*) + 1) AS BIGINT) AS w_ppm
         |  FROM gb GROUP BY b
         |), sc AS (
         |  SELECT doc_id, COUNT(*) AS n_grams,
         |         CAST(SUM(w_ppm) // COUNT(*) AS BIGINT) AS score_ppm
         |  FROM gb JOIN bw USING (b) GROUP BY doc_id
         |), tp AS (
         |  SELECT doc_id,
         |         ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS rn
         |  FROM sc
         |)
         |SELECT s.doc_id, s.n_grams, s.score_ppm,
         |  CAST(CASE WHEN t.rn <= 100 THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM sc s JOIN tp t USING (doc_id)
         |ORDER BY s.doc_id""".stripMargin,
    "zstd_jsonl_roundtrip" ->
      """SELECT doc_id, source, substring(text, 1, 40) AS snippet,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS source_alt
        |FROM documents ORDER BY doc_id""".stripMargin,
    "arrow_roundtrip" ->
      """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang_alt,
        |  lang AS meta_nm, CAST(n_chars AS BIGINT) AS meta_ln,
        |  doc_id AS arr0, CAST(n_chars AS BIGINT) AS arr1
        |FROM documents ORDER BY doc_id""".stripMargin)
}
