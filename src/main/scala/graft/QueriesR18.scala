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
                .otherwise(col("lang")).as("lang_alt"))
            .repartition(4), out)
        out
      })
    graft.sources.ArrowIpc.read(s, root).orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zstd_jsonl_roundtrip" -> (zstdJsonlRoundtrip _),
    "arrow_roundtrip" -> (arrowRoundtrip _))

  val sql: Map[String, String] = Map(
    "zstd_jsonl_roundtrip" ->
      """SELECT doc_id, source, substring(text, 1, 40) AS snippet,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS source_alt
        |FROM documents ORDER BY doc_id""".stripMargin,
    "arrow_roundtrip" ->
      """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang_alt
        |FROM documents ORDER BY doc_id""".stripMargin)
}
