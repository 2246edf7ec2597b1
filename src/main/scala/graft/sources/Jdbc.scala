package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the Spark-native form of the reference's Oracle
  * reads/writes (scripts/03_cdc_etl.py:227-232 fetchsize read, :309-319
  * batchsize staging write).
  *
  * Scale posture: a plain JDBC read is a single connection; `readPartitioned`
  * splits the table into `numPartitions` range predicates on a numeric key so
  * 1000 executors pull in parallel, and Catalyst pushes filters/projections
  * into the generated SQL. Writes go per-partition with JDBC batch inserts.
  */
object Jdbc {
  final case class Conn(url: String, user: String = "", password: String = "",
                        driver: String = "")

  private def base(spark: SparkSession, c: Conn) = {
    var r = spark.read.format("jdbc").option("url", c.url)
    if (c.user.nonEmpty) r = r.option("user", c.user).option("password", c.password)
    if (c.driver.nonEmpty) r = r.option("driver", c.driver)
    r
  }

  /** Single-stream read with cursor fetchsize (reference READ_FETCHSIZE). */
  def read(spark: SparkSession, c: Conn, table: String, fetchSize: Int = 10000): DataFrame =
    base(spark, c).option("dbtable", table).option("fetchsize", fetchSize.toString).load()

  /** Range-partitioned parallel read over a numeric column — the 100 TB
    * path: each executor issues its own bounded query.
    */
  def readPartitioned(spark: SparkSession, c: Conn, table: String, partitionColumn: String,
                      lowerBound: Long, upperBound: Long, numPartitions: Int,
                      fetchSize: Int = 10000): DataFrame =
    base(spark, c).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .option("fetchsize", fetchSize.toString)
      .load()

  /** Batched append write (reference WRITE_BATCHSIZE staging load). */
  def write(df: DataFrame, c: Conn, table: String, batchSize: Int = 5000,
            mode: SaveMode = SaveMode.Append): Unit = {
    var w = df.write.format("jdbc").option("url", c.url).option("dbtable", table)
      .option("batchsize", batchSize.toString)
    if (c.user.nonEmpty) w = w.option("user", c.user).option("password", c.password)
    if (c.driver.nonEmpty) w = w.option("driver", c.driver)
    w.mode(mode).save()
  }
}
