package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unified per-file pruning manifest: min/max boxes for the CLUSTERED
  * dimensions and sparse bloom filters for high-cardinality point-lookup
  * columns, derived in ONE scan and stored side by side — the local
  * stand-in for the table format's stats + bloom metadata at lakehouse
  * scale (Iceberg/Delta keep exactly this pair per data file).
  *
  * Why both: a Hilbert/Z layout gives every file a bounded rectangle of
  * clustered-key space, so range predicates on those dimensions prune by
  * box intersection; but an equality probe on any OTHER column intersects
  * every box and prunes nothing — that's the bloom column's job ("might
  * this file contain v?", no false negatives). One manifest read answers
  * both, and a scan with BOTH predicate kinds intersects the two file
  * sets before touching data.
  *
  * Built on the [[ZOrder]] primitives (same bloomPositions hashing, so
  * build and probe are bit-identical by construction); the bloom is the
  * sorted set-bit-position array (≤ `bits` ints per file per column) —
  * collect_list of per-row position arrays flattened in the aggregate, so
  * the single pass needs no explode and the min/max rows never duplicate.
  */
object FileManifest {
  /** One row per file: min_/max_ per range column, bloom_ per bloom
    * column. Everything from a single groupBy(file) pass.
    */
  def build(spark: SparkSession, path: String, rangeCols: Seq[String],
            bloomCols: Seq[String], bits: Int = 4096,
            hashes: Int = 3): DataFrame =
    buildFiles(spark, Seq(path), rangeCols, bloomCols, bits, hashes)

  /** [[build]] over an explicit file list — the incremental-maintenance
    * entry point: after [[ZOrder.appendClustered]] returns the delta's
    * new files, manifest rows for JUST those files come from a
    * delta-sized scan. Same aggregate as the full build, so incremental
    * union ≡ rebuild row-for-row.
    */
  def buildFiles(spark: SparkSession, paths: Seq[String],
                 rangeCols: Seq[String], bloomCols: Seq[String],
                 bits: Int = 4096, hashes: Int = 3): DataFrame = {
    require(rangeCols.nonEmpty || bloomCols.nonEmpty, "no manifest columns")
    require(paths.nonEmpty, "no paths")
    val base = spark.read.parquet(paths: _*)
    val projected = base.select(
      (input_file_name().as("file") +:
        (rangeCols.map(col) ++
          bloomCols.map(c =>
            ZOrder.bloomPositions(col(c), bits, hashes).as(s"__pos_$c")))): _*)
    val aggs =
      rangeCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
        bloomCols.map(c =>
          array_sort(array_distinct(flatten(collect_list(col(s"__pos_$c")))))
            .as(s"bloom_$c"))
    projected.groupBy(col("file")).agg(aggs.head, aggs.tail: _*)
  }

  /** Scan only the files that BOTH box-intersect every range predicate
    * and bloom-possibly-contain every equality probe, then apply the
    * exact predicates as a residual. No false negatives: every row
    * satisfying the predicates is in a selected file. Returns
    * (selectedFiles, totalFiles, dataframe).
    */
  def prunedScan(spark: SparkSession, path: String, manifest: DataFrame,
                 ranges: Map[String, (Long, Long)], equalities: Map[String, Any],
                 bits: Int = 4096, hashes: Int = 3): (Long, Long, DataFrame) = {
    require(ranges.nonEmpty || equalities.nonEmpty, "no predicates")
    val schema = spark.read.parquet(path).schema
    val boxPreds = ranges.map { case (c, (lo, hi)) =>
      col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }
    // bloomPositions hashing is input-TYPE-sensitive: probe with the
    // indexed column's actual type (see ZOrder.bloomPrunedScan)
    val bloomPreds = equalities.map { case (c, v) =>
      val probe = ZOrder.bloomPositions(lit(v).cast(schema(c).dataType), bits, hashes)
      forall(probe, p => array_contains(col(s"bloom_$c"), p))
    }
    val keep = (boxPreds ++ bloomPreds).reduce(_ && _)
    val total = manifest.count()
    // surviving FILE PATHS collect to the driver — the stated bound of
    // this manifest design (like Delta/Iceberg drivers): list size is
    // O(files), fine to ~10^6 entries at ~100 B each; beyond that the
    // layout wants coarser files or a partitioned manifest, not a
    // driver-side fix
    val files = manifest.filter(keep).select("file").collect().map(_.getString(0))
    val residual = (ranges.map { case (c, (lo, hi)) =>
      col(c) >= lo && col(c) <= hi
    } ++ equalities.map { case (c, v) =>
      col(c) === lit(v).cast(schema(c).dataType)
    }).reduce(_ && _)
    val df =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*).filter(residual)
    (files.length.toLong, total, df)
  }

  // --------------------------------------------------- versioned snapshots

  /** F10: versioned manifest snapshots — each layout rewrite commits its
    * manifest as `v<N>` under a root, so past table states stay readable
    * (time travel) until [[vacuum]] retires them: the MVCC contract of
    * the lakehouse formats, local-filesystem scale. Commit is atomic by
    * the same idiom as Sink's compaction manifest: write to a temp dir,
    * rename into place — a torn write never becomes a visible version.
    *
    * @return the committed version id (monotone, max existing + 1)
    */
  def commitVersion(manifest: DataFrame, root: String): Long = {
    val dir = new java.io.File(root)
    dir.mkdirs()
    val v = versions(root).lastOption.getOrElse(0L) + 1L
    val tmp = new java.io.File(dir, s".tmp_v$v")
    manifest.write.mode("overwrite").parquet(tmp.toString)
    val fin = new java.io.File(dir, s"v$v")
    if (!tmp.renameTo(fin))
      throw new java.io.IOException(s"cannot commit manifest version $v")
    v
  }

  /** F11: extend the latest committed manifest with delta rows (built
    * via [[buildFiles]] over only the appended files) and commit the
    * union as a NEW version — the incremental metadata commit paired
    * with [[ZOrder.appendClustered]]. History stays time-travelable
    * ([[readVersion]]) and vacuumable; total append cost is
    * O(delta data) + O(manifest metadata), never a table re-scan.
    *
    * @return the committed version id
    */
  def appendVersion(spark: SparkSession, root: String,
                    deltaManifest: DataFrame): Long = {
    val merged = readVersion(spark, root).unionByName(deltaManifest)
    commitVersion(merged, root)
  }

  /** Committed version ids under a root, ascending. */
  def versions(root: String): Seq[Long] = {
    val d = new java.io.File(root)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.map(_.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toLong).sorted
  }

  /** Read a committed manifest version (latest when `v` < 0). */
  def readVersion(spark: SparkSession, root: String, v: Long = -1L): DataFrame = {
    val vs = versions(root)
    require(vs.nonEmpty, s"no committed manifest versions under $root")
    val pick = if (v < 0) vs.last else v
    require(vs.contains(pick), s"version $pick not in $vs")
    spark.read.parquet(s"$root/v$pick")
  }

  /** Retire history: keep the newest `keepLast` manifest versions, then
    * delete every data file referenced ONLY by retired versions. Order
    * is crash-safe by construction — versions are removed before any
    * data file, so a crash mid-vacuum can orphan data files (re-vacuum
    * collects them) but can never leave a live version pointing at a
    * deleted file. Files referenced by ANY retained version survive.
    *
    * @return (retired version ids, deleted data file count)
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): (Seq[Long], Long) = {
    require(keepLast >= 1, "must keep at least one version")
    val vs = versions(root)
    val (old, keep) = vs.splitAt(math.max(0, vs.length - keepLast))
    if (old.isEmpty) return (Seq.empty, 0L)
    // referenced-file sets collect to the driver — same stated O(files)
    // bound as scan(): manifest rows are metadata, never data
    val referenced = (v: Seq[Long]) =>
      if (v.isEmpty) Set.empty[String]
      else v.map(i => spark.read.parquet(s"$root/v$i").select("file"))
        .reduce(_ unionByName _).distinct().collect().map(_.getString(0)).toSet
    val dead = referenced(old) -- referenced(keep)
    // retire versions FIRST (atomic per version: rename away then delete)
    old.foreach { i =>
      val f = new java.io.File(root, s"v$i")
      val t = new java.io.File(root, s".rm_v$i")
      if (f.renameTo(t)) {
        t.listFiles().foreach(_.delete()); t.delete()
      }
    }
    dead.foreach { f =>
      val p = if (f.startsWith("file:"))
        new java.io.File(new java.net.URI(f).getPath)
      else new java.io.File(f)
      p.delete()
    }
    (old, dead.size.toLong)
  }
}
