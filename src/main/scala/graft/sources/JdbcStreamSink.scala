package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** X20/F11: exactly-once streaming CDC apply into a JDBC target.
  *
  * Structured Streaming's foreachBatch gives at-least-once delivery: a
  * crash between sink write and checkpoint commit re-delivers the epoch.
  * MERGE is idempotent for pure upserts, but any non-idempotent target
  * effect (audit inserts, counters, downstream triggers fired per MERGE)
  * double-applies. The standard fix, implemented here: an applied-epochs
  * ledger in the TARGET database, written in the SAME transaction as the
  * apply — the (query, epoch) primary key makes re-delivery a detected
  * no-op, so "apply + mark" is atomic and each epoch's effect happens
  * exactly once no matter how many times the engine re-runs it.
  *
  * Staging is outside the transaction (Spark's JDBC writer uses its own
  * connections) and deliberately so: re-staging before a skipped epoch is
  * harmless — the transactional unit is marker + MERGE.
  *
  * Reference anchor: the reference's MERGE loop (03_cdc_etl.py:129-157)
  * run continuously with a delivery guarantee its batch script doesn't
  * need.
  */
object JdbcStreamSink {
  val EpochTable = "graft_applied_epochs"

  /** Create the ledger if absent (Derby has no IF NOT EXISTS; the
    * already-exists SQLState X0Y32 is the idempotence signal).
    */
  def ensureEpochTable(c: Jdbc.Conn): Unit =
    try JdbcMerge.execute(c,
      s"""CREATE TABLE $EpochTable (
         |  query_name VARCHAR(128) NOT NULL,
         |  epoch_id BIGINT NOT NULL,
         |  PRIMARY KEY (query_name, epoch_id))""".stripMargin)
    catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
    }

  /** Run `apply` exactly once for (queryName, epochId): the ledger insert
    * and the apply share one transaction; a duplicate epoch rolls back
    * and reports false without running `apply`.
    */
  def applyEpochOnce(c: Jdbc.Conn, queryName: String, epochId: Long)
                    (apply: java.sql.Connection => Unit): Boolean =
    Jdbc.withConnection(c) { conn =>
      conn.setAutoCommit(false)
      try {
        val ps = conn.prepareStatement(s"INSERT INTO $EpochTable VALUES (?, ?)")
        ps.setString(1, queryName)
        ps.setLong(2, epochId)
        val dup =
          try { ps.executeUpdate(); false }
          catch {
            case _: java.sql.SQLIntegrityConstraintViolationException => true
            case e: java.sql.SQLException if e.getSQLState == "23505" => true
          } finally ps.close()
        if (dup) { conn.rollback(); false }
        else {
          apply(conn)
          conn.commit()
          true
        }
      } catch { case t: Throwable => conn.rollback(); throw t }
    }

  /** Stream a CDC delta directory into a JDBC target with exactly-once
    * epochs: per micro-batch, stage the delta then run the soft-delete
    * MERGE under [[applyEpochOnce]]. Returns the number of epochs that
    * actually applied (re-delivered epochs are skipped by the ledger, so
    * a restart without a checkpoint — or a replayed epoch after a crash —
    * changes nothing).
    */
  def streamCdcApplyJdbc(spark: SparkSession, deltaPath: String,
                         schema: StructType, c: Jdbc.Conn, target: String,
                         staging: String, pk: Seq[String],
                         queryName: String): Long = {
    ensureEpochTable(c)
    var applied = 0L
    val q = spark.readStream.schema(schema).parquet(deltaPath)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          JdbcMerge.execute(c, s"DELETE FROM $staging")
          Jdbc.write(batch, c, staging)
          val cols = batch.columns.toSeq
          if (applyEpochOnce(c, queryName, epochId) { conn =>
                val st = conn.createStatement()
                try st.executeUpdate(
                  JdbcMerge.mergeSoftDeleteSql(target, staging, pk, cols))
                finally st.close()
              }) applied += 1
        }
        ()
      }
      .queryName(queryName).start()
    try q.processAllAvailable() finally q.stop()
    applied
  }
}
