package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

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
  /** F12: permissive ingest with corrupt-record quarantine — the 100 TB
    * ingest reality: a multi-TB CSV/JSON drop ALWAYS contains torn
    * lines, stray quotes, schema drift; failing the job on row 3 billion
    * (FAILFAST) or silently nulling bad rows (default PERMISSIVE
    * without capture) both lose. This reads PERMISSIVE with the
    * `_corrupt_record` side column and splits the result into (clean
    * rows, quarantine rows) — clean rows flow on, quarantine keeps the
    * RAW line for repair-and-replay, the pattern every production
    * loader converges on.
    *
    * The split is two filters over one cached read (Spark requires
    * referencing the corrupt column via a materialized plan — a direct
    * filter on a lazily-read corrupt column is disallowed since 2.3).
    *
    * @param schema expected schema (the corrupt column is appended
    *               automatically)
    * @return (clean, quarantine): clean has exactly `schema`'s columns;
    *         quarantine is (raw `_corrupt_record` string) rows
    */
  def readQuarantine(spark: org.apache.spark.sql.SparkSession, path: String,
                     format: String,
                     schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, DataFrame) = {
    require(format == "csv" || format == "json",
      s"quarantine ingest is for row formats, got $format")
    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType, nullable = true)
    val r = spark.read.format(format).schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    val df = (if (format == "csv") r.option("header", "true") else r)
      .load(path).cache()
    val clean = df.filter(col("_corrupt_record").isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantine = df.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
    (clean, quarantine)
  }

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
    * translate directly).
    *
    * Crash safety (plain filesystems have no multi-file atomic commit, so
    * the failure mode is chosen, not eliminated): a manifest listing the
    * original files is written first, then the compacted files are renamed
    * to their final VISIBLE names (`compacted-N-…parquet`, collision-free
    * with the originals' `part-…` names), and only then are the originals
    * deleted and the manifest removed. A crash mid-swap therefore leaves a
    * readable dataset with duplicate rows plus the manifest — never an
    * empty one — and the next compactParquet call replays the manifest's
    * deletions before doing anything else.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val dir = new java.io.File(path)
    recoverCompaction(dir)
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
    val keep = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
    val originals = entries
      .filter(f => f.isFile && (f.getName.endsWith(".parquet") || f.getName.startsWith("_")))
    val finalNames = keep.zipWithIndex.map { case (f, i) => s"compacted-$i-${f.getName}" }
    // 1. durable undo/redo log: K = compacted files that must all exist
    //    before any D (original) may be deleted. K lines first and the
    //    whole file written to a temp name + atomic rename: a torn write
    //    can then only lose a D suffix (recovery re-deletes nothing worse
    //    than leftovers), never present a D-only manifest that would
    //    vacuously roll forward and delete every original.
    val manifest = new java.io.File(dir, ManifestName)
    writeLinesAtomic(manifest,
      finalNames.map(n => s"K $n") ++ originals.map(n => s"D ${n.getName}"))
    // 2. new files in, VISIBLE and uniquely named
    keep.zip(finalNames).foreach { case (f, name) =>
      require(f.renameTo(new java.io.File(dir, name)),
        s"compactParquet: rename failed for ${f.getName}")
    }
    // 3. originals out, log gone
    originals.foreach(_.delete())
    manifest.delete()
    delete(new java.io.File(tmp))
    nFiles
  }

  private val ManifestName = ".compact_manifest"

  /** Finish an interrupted swap. The manifest records the full plan, so
    * recovery is decidable from the filesystem alone: if every K
    * (compacted) file exists the data is completely duplicated and the
    * swap ROLLS FORWARD (delete the D originals); if any K is missing the
    * rename phase died early and it ROLLS BACK (delete the partial
    * compacted files, originals untouched). Either way the directory ends
    * holding the rows exactly once.
    */
  private def recoverCompaction(dir: java.io.File): Unit = {
    // a crash before the atomic rename leaves only the harmless temp copy
    new java.io.File(dir, ManifestName + ".tmp").delete()
    val manifest = new java.io.File(dir, ManifestName)
    if (manifest.isFile) {
      val lines = {
        val src = scala.io.Source.fromFile(manifest)
        try src.getLines().toVector finally src.close()
      }
      val dels = lines.collect { case s if s.startsWith("D ") => s.drop(2) }
      val keeps = lines.collect { case s if s.startsWith("K ") => s.drop(2) }
      // an empty keep list can only come from a torn manifest (compaction
      // always produces >=1 file) — roll BACK, never forward
      if (keeps.nonEmpty && keeps.forall(n => new java.io.File(dir, n).isFile))
        dels.foreach(n => new java.io.File(dir, n).delete())
      else
        keeps.foreach(n => new java.io.File(dir, n).delete())
      manifest.delete()
      delete(new java.io.File(dir, ".compact_tmp"))
    }
  }

  /** Write-then-rename so the file appears atomically: readers (and
    * recovery after a crash) either see no file or the complete one,
    * never a partially flushed prefix. Shared with Pipeline's run-report
    * writer — one crash-safety mechanism, not two copies.
    */
  private[graft] def writeLinesAtomic(f: java.io.File, lines: Seq[String]): Unit = {
    val tmp = new java.io.File(f.getParentFile, f.getName + ".tmp")
    val w = new java.io.PrintWriter(tmp)
    try lines.foreach(w.println) finally w.close()
    require(tmp.renameTo(f), s"atomic manifest rename failed: $tmp -> $f")
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete()
  }
}
