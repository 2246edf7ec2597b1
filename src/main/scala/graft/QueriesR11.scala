package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Jdbc, Tables}

/** Round-5 batch: the JDBC edge under the parquet oracle, and the SQL
  * front-end composites.
  *
  * Reference anchor: the reference IS a database-to-database pipeline
  * (03_cdc_etl.py fetchsize reads :227-232, batchsize staging writes
  * :309-319) queried in SQL by its warehouse users — these gates prove
  * the same edges against a real embedded database and a pure-SQL entry
  * path, not just unit specs.
  */
object QueriesR11 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** C11+C12 parity gate: the JDBC edge round-trips the customer table
    * through an embedded Derby database — batched-insert sink
    * (WRITE_BATCHSIZE) then range-PARTITIONED parallel read with a
    * cursor fetchsize (READ_FETCHSIZE) — and must hand back value-exact
    * rows: the DuckDB oracle reads the ORIGINAL parquet, so any
    * truncation, type drift, or partition-boundary loss on the database
    * edge breaks the hash. In-memory Derby keeps the gate hermetic; the
    * unique db name isolates re-runs within one JVM.
    */
  def jdbcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    val conn = Jdbc.Conn(
      url = s"jdbc:derby:memory:graft_gate_${System.nanoTime()};create=true",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    Jdbc.write(cust, conn, "CUST_GATE", batchSize = 256)
    val Array(lo, hi) = cust
      .agg(min(col("c_custkey")), max(col("c_custkey")))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    Jdbc.readPartitioned(s, conn, "CUST_GATE", "C_CUSTKEY",
        lowerBound = lo, upperBound = hi + 1, numPartitions = 8,
        fetchSize = 500)
      .select(col("C_CUSTKEY").as("c_custkey"), col("C_NAME").as("c_name"),
        col("C_NATIONKEY").as("c_nationkey"),
        col("C_ACCTBAL").as("c_acctbal"),
        col("C_MKTSEGMENT").as("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- oracle

  val sql: Map[String, String] = Map(
    "jdbc_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin)
}
