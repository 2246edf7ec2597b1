package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side of the engine: the replica/lakehouse sinks.
  *
  * At 100 TB the only write patterns that matter are (a) partitioned
  * columnar writes so downstream scans prune to the partitions they need,
  * and (b) bucketed tables so repeated key joins skip their shuffles
  * (BucketingSpec). Row formats (csv/json) exist for interchange, not for
  * the hot path.
  */
object Sink {
  /** Partition-pruned columnar layout: one directory per partition value.
    * Readers filtering on the partition columns scan only matching
    * directories (PartitionFilters, asserted in SourcesSpec).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       format: String = "parquet",
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.partitionBy(partitionCols: _*).format(format).mode(mode).save(path)

  /** Plain format write (parquet/orc/csv/json). csv gets headers so the
    * round-trip preserves column names.
    */
  def write(df: DataFrame, path: String, format: String,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.format(format).mode(mode)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  /** Read back anything write() produced. */
  def read(spark: org.apache.spark.sql.SparkSession, path: String,
           format: String): DataFrame = {
    val r = spark.read.format(format)
    (if (format == "csv") r.option("header", "true").option("inferSchema", "true")
     else r).load(path)
  }
}
