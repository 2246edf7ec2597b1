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

  /** Small-file compaction: rewrite a parquet directory into files of
    * ~`targetFileBytes`. Incremental pipelines (the CDC merge loop) leave
    * one small file per micro-batch/run; at 100 TB the resulting
    * million-file listings and sub-rowgroup reads dominate scan cost, so
    * compaction is a first-class maintenance op. File count comes from the
    * on-disk byte size (data is already encoded+compressed, so bytes/file
    * translate directly); the rewrite goes through a temp dir + atomic-ish
    * swap like ParquetTarget.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val dir = new java.io.File(path)
    val entries = Option(dir.listFiles()).getOrElse(Array.empty)
    // flat directories only: for a partitionBy layout the data lives in
    // subdirectories this pass would neither size nor delete — compacting
    // would duplicate every row (compact each partition directory instead)
    require(!entries.exists(f => f.isDirectory && !f.getName.startsWith(".")),
      s"compactParquet: $path has partition subdirectories; compact per partition")
    val bytes = entries
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length()).sum
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val tmp = s"$path/.compact_tmp"
    spark.read.parquet(path).repartition(nFiles.toInt)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val keep = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.endsWith(".parquet") || f.getName.startsWith("_SUCCESS"))
    // move the new files in BEFORE deleting the originals: a failed rename
    // must abort while the old data still exists
    keep.foreach { f =>
      val dest = new java.io.File(dir, s".compacted_${f.getName}")
      require(f.renameTo(dest), s"compactParquet: rename failed for ${f.getName}")
    }
    entries
      .filter(f => f.isFile && (f.getName.endsWith(".parquet") || f.getName.startsWith("_")))
      .foreach(_.delete())
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".compacted_")).foreach { f =>
        require(f.renameTo(new java.io.File(dir, f.getName.stripPrefix(".compacted_"))),
          s"compactParquet: final rename failed for ${f.getName}")
      }
    delete(new java.io.File(tmp))
    nFiles
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete()
  }
}
