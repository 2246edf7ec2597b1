package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => LegacyOffset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** F14k (r12): the Delta CHANGE FEED as a STRUCTURED STREAMING source —
  * the standard consumption shape the r11 verdict ranked ("readStream
  * from a version, emitting per-commit change batches"). Offsets are
  * COMMIT VERSIONS: each trigger covers the versions (lastOffset,
  * min(head, lastOffset + maxVersionsPerTrigger)] and its batch is
  * exactly [[DeltaLog.tableChangesByVersion]] over that range — the
  * streamed feed is bit-for-bit the batch feed by construction, and a
  * NEW commit landing between triggers surfaces in the next one (the
  * follow-the-log contract). The diff itself stays a distributed
  * exceptAll pair per step — the driver touches only the log listing.
  *
  * Options: `table` (or `path`) — the delta table root;
  * `startingVersion` — changes AFTER this version stream (default 0);
  * `maxVersionsPerTrigger` — admission control, commits per
  * micro-batch (default Int.MaxValue = catch up in one batch).
  *
  * V1 `Source` on purpose: `getBatch` returns a DataFrame, which is
  * the only streaming API that lets each micro-batch BE the
  * distributed snapshot diff (a DSv2 PartitionReader cannot run a
  * join); the same choice real lake connectors made for years.
  */
final class DeltaCdfProvider extends StreamSourceProvider {

  private def tableOf(params: Map[String, String]): String =
    params.get("table").orElse(params.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "delta-cdf source needs option 'table' (or 'path')"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    ("graft-delta-cdf",
      DeltaCdfProvider.cdfSchema(sqlContext.sparkSession, tableOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val feed = parameters.getOrElse("feed", "diff")
    require(feed == "diff" || feed == "recorded",
      s"option feed must be diff|recorded, got $feed")
    new DeltaCdfSource(sqlContext.sparkSession, tableOf(parameters),
      parameters.getOrElse("startingVersion", "0").toLong,
      parameters.getOrElse("maxVersionsPerTrigger",
        Int.MaxValue.toString).toInt,
      recorded = feed == "recorded")
  }
}

object DeltaCdfProvider {
  /** The feed's schema: the table's LOGICAL columns (partition columns
    * included, [[DeltaLog.read]]'s output shape) + `_change_type` +
    * `_commit_version`.
    */
  def cdfSchema(spark: SparkSession, table: String): StructType = {
    val st = DeltaLog.state(spark, table)
    StructType(st.schema.fields.map(f => f.copy(metadata =
        org.apache.spark.sql.types.Metadata.empty)).toSeq ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
  }
}

/** `recorded = true` streams [[DeltaLog.tableChangesCdf]] (the cdc
  * actions + `_change_data` files — update pre/post images included,
  * F14n) instead of the snapshot diff; `startingVersion = -1` then
  * includes version 0's inserts.
  */
private final class DeltaCdfSource(spark: SparkSession, table: String,
                                   startingVersion: Long,
                                   maxVersionsPerTrigger: Int,
                                   recorded: Boolean = false)
    extends Source {

  require(maxVersionsPerTrigger >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")

  override val schema: StructType = DeltaCdfProvider.cdfSchema(spark, table)

  // admission control state: the newest version already OFFERED as an
  // offset (not necessarily committed — the executor tracks that)
  private var planned: Long = startingVersion

  override def getOffset: Option[LegacyOffset] = {
    val head = DeltaLog.state(spark, table).version
    val target = math.min(head, planned + maxVersionsPerTrigger)
    if (target <= startingVersion) None
    else {
      planned = math.max(planned, target)
      Some(LongOffset(target))
    }
  }

  private def versionOf(o: LegacyOffset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset on restart
  }

  override def getBatch(start: Option[LegacyOffset],
                        end: LegacyOffset): DataFrame = {
    val fromV = start.map(versionOf).getOrElse(startingVersion)
    val toV = versionOf(end)
    planned = math.max(planned, toV)
    val changes =
      if (recorded) DeltaLog.tableChangesCdf(spark, table, fromV, toV)
      else DeltaLog.tableChangesByVersion(spark, table, fromV, toV)
    val df = changes.select(schema.fieldNames.map(col).toSeq: _*)
    org.apache.spark.sql.graftbridge.ColumnBridge.asStreaming(df)
  }

  override def stop(): Unit = ()
}
