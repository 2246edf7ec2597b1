package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_unigram_vocab" -> (textUnigramVocab _),
    "text_unigram_tokenize" -> (textUnigramTokenize _),
    "text_pack_unigram" -> (textPackUnigram _))

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
         |FROM ck ORDER BY doc_id""".stripMargin)
}
