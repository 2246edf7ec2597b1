package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-10b surface growth: the next real-lake tier the r10 sketch
  * ranked — record create-times on the Kafka wire with ListOffsets
  * time seeks (X55), Iceberg APPEND commits (F15d), Avro reader-schema
  * RESOLUTION (F16c), and planar (PlanarConfiguration=2) TIFF (M17d).
  * House contract as everywhere: deterministic fixtures, every gate a
  * bit-exact hash compare against DuckDB on the same tables.
  */
object QueriesR20 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** X55: seek-by-TIME on the Kafka wire — orders produced with their
    * o_orderkey as the record CREATE-TIME (monotone per partition:
    * `repartition(pt).sortWithinPartitions(pt, ts)`, the layout the
    * broker time index assumes), then the stream STARTS from
    * `offsetsForTimes(T)` where T = ⌊max(o_orderkey)/2⌋ — a real
    * ListOffsets v1 timestamp lookup, not the -1/-2 sentinels — and
    * replays exactly the suffix. The aggregate carries min/max of the
    * WIRE timestamp column per group, so the hash compare witnesses
    * both the seek boundary (nothing below T leaks in) and create-time
    * fidelity through produce → broker log → fetch.
    */
  def streamKafkaSeekTs(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
      (col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long").as("cents"))
    val server = graft.streaming.KafkaBusServer.serve(
      null, emptyPartitions = 4)
    try {
      graft.streaming.KafkaWire.produceSinkTimestamped(
        o.select(pmod(col("o_orderkey"), lit(4)).as("pt"),
            col("o_orderkey").as("ts"),
            to_json(struct(col("o_orderstatus"), col("cents"))).as("v"))
          .repartition(4, col("pt"))
          .sortWithinPartitions(col("pt"), col("ts")),
        "127.0.0.1", server.port, "bus",
        col("pt"), col("ts"), col("v"))
      val seekTs = o.agg(floor(max(col("o_orderkey")) / 2).cast("long"))
        .head.getLong(0) // driver scalar: the seek point, metadata-sized
      val trigger = math.max(100L, o.count() / 8)
      graft.streaming.Streams.kafkaBusReplayFrom(s, "127.0.0.1", server.port,
          "bus", seekTs, trigger, s"gate_kafkaseek_${System.nanoTime()}") { stream =>
        stream.select(col("timestamp").as("ts"),
            from_json(col("value"),
              org.apache.spark.sql.types.StructType.fromDDL(
                "o_orderstatus STRING, cents LONG")).as("e"))
          .groupBy(col("e.o_orderstatus").as("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("e.cents")).as("sum_cents"),
            min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
      }.orderBy(col("o_orderstatus"))
    } finally server.close()
  }

  private val tableBuildMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), String]()

  /** The F15e fixture: a table BORN EMPTY (snapshot 10 = a manifest
    * list with no manifests) that reaches its full state through two
    * engine-written APPEND commits — suppliers with s_suppkey % 4 ≠ 0
    * at snapshot 20, the remainder at snapshot 30 — so the read
    * witnesses that appends COMPOSE (the second commit extends the
    * live set, never replaces it).
    */
  private def buildIcebergAppendTable(s: SparkSession, dir: String): String =
    tableBuildMemo.computeIfAbsent(
      (s.sparkContext.applicationId, dir, "iceberg_append"), _ => {
        import graft.sources.IcebergCatalog._
        val t0 = java.nio.file.Files.createTempDirectory("ice_app_rt")
        val mdir = t0.resolve("metadata")
        java.nio.file.Files.createDirectories(mdir)
        val ml1 = mdir.resolve("snap-10.avro")
        writeManifestList(ml1, Seq.empty)
        writeMetadataJson(mdir.resolve("v1.metadata.json"),
          Seq(("s_suppkey", "long", true), ("s_name", "string", false),
            ("cents", "long", false), ("nk", "string", false)),
          Seq("nk"), Seq(10L -> ml1))
        val sup = t(s, dir, "supplier").select(
          col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
          (col("s_acctbal").cast("decimal(12,2)") * 100)
            .cast("long").as("cents"),
          pmod(col("s_suppkey"), lit(5)).cast("string").as("nk"))
        val s1 = commitAppend(s, t0.toString,
          sup.filter(col("s_suppkey") % 4 =!= 0), snapshotId = 20L)
        require(s1 == 20L)
        val s2 = commitAppend(s, t0.toString,
          sup.filter(col("s_suppkey") % 4 === 0), snapshotId = 30L)
        require(s2 == 30L)
        t0.toString
      })

  /** F15e (r10b): Iceberg APPEND write — `commitAppend` turns a
    * DataFrame into data parquet files (one distributed partitionBy
    * write; identity-partition values ride the manifest entries, long
    * column bounds included for pruning), a content=0 manifest, and a
    * new snapshot/metadata version; two successive appends rebuild the
    * WHOLE supplier table from empty, and the engine's own reader
    * returns it. Oracle = the same projection in plain SQL — the
    * commit machinery must be invisible.
    */
  def icebergAppendRoundtrip(s: SparkSession, dir: String): DataFrame =
    graft.sources.IcebergCatalog.read(s, buildIcebergAppendTable(s, dir))
      .select(col("s_suppkey"), col("s_name"), col("cents"), col("nk"))
      .orderBy(col("s_suppkey"))

  private val avroEvoMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** F16c (r10b): Avro schema RESOLUTION across generations — the
    * evolution rules every long-lived lake table eventually needs,
    * exercised on a directory holding TWO writer-schema generations of
    * documents: gen-1 (even doc_ids) wrote `(doc_id int, source)`,
    * gen-2 (odd doc_ids) wrote `(source, text_len, doc_id long)` —
    * reordered, with a new column, and with doc_id WIDENED. One
    * [[graft.sources.AvroTable.readResolved]] under the reader schema
    * `(doc_id long, source, text_len long)` spans both: fields match
    * by name, gen-1's int doc_id PROMOTES to long, gen-1's missing
    * text_len takes its null default, and gen-2's reordering is
    * invisible. Oracle = the same rows in plain SQL with text_len null
    * on the even generation.
    */
  def avroEvolutionRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = avroEvoMemo.computeIfAbsent(
      (s.sparkContext.applicationId, dir), _ => {
        val out = java.nio.file.Files
          .createTempDirectory("graft_avro_evo")
        val d = t(s, dir, "documents")
        val g1 = java.nio.file.Files.createTempDirectory("avro_evo_g1")
        val g2 = java.nio.file.Files.createTempDirectory("avro_evo_g2")
        graft.sources.AvroTable.write(
          d.filter(col("doc_id") % 2 === 0)
            .select(col("doc_id").cast("int").as("doc_id"), col("source")),
          g1.toString)
        graft.sources.AvroTable.write(
          d.filter(col("doc_id") % 2 === 1)
            .select(col("source"),
              length(col("text")).cast("long").as("text_len"),
              col("doc_id")),
          g2.toString)
        // both generations land in ONE directory, per-generation names
        import scala.jdk.CollectionConverters._
        Seq(("g1", g1), ("g2", g2)).foreach { case (tag, src) =>
          java.nio.file.Files.list(src).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".avro"))
            .foreach { f =>
              java.nio.file.Files.move(f,
                out.resolve(s"$tag-${f.getFileName}"))
            }
        }
        out.toString
      })
    val readerSchema = graft.sources.AvroTable.avroSchemaJson(
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, source STRING, text_len BIGINT"), "row")
    graft.sources.AvroTable.readResolved(s, root, readerSchema)
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_kafka_seek_ts" -> (streamKafkaSeekTs _),
    "iceberg_append_roundtrip" -> (icebergAppendRoundtrip _),
    "avro_evolution_roundtrip" -> (avroEvolutionRoundtrip _))

  val sql: Map[String, String] = Map(
    "stream_kafka_seek_ts" ->
      """WITH thr AS (
        |  SELECT CAST(FLOOR(MAX(o_orderkey) / 2.0) AS BIGINT) AS t
        |  FROM orders)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS sum_cents,
        |  CAST(MIN(o_orderkey) AS BIGINT) AS min_ts,
        |  CAST(MAX(o_orderkey) AS BIGINT) AS max_ts
        |FROM orders, thr WHERE o_orderkey >= thr.t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "iceberg_append_roundtrip" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
        |  CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
        |  CAST(s_suppkey % 5 AS VARCHAR) AS nk
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "avro_evolution_roundtrip" ->
      """SELECT doc_id, source,
        |  CASE WHEN doc_id % 2 = 1 THEN CAST(length(text) AS BIGINT) END
        |    AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin)
}
