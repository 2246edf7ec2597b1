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
            hashes: Int = 3): DataFrame = {
    require(rangeCols.nonEmpty || bloomCols.nonEmpty, "no manifest columns")
    val base = spark.read.parquet(path)
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
}
