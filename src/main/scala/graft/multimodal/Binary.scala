package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition in batches.
  *
  * The real decode libraries are not in this container, so the decoder is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing (schema,
  * per-partition batching, narrow execution, metadata struct shape) is the
  * real production shape: swap `stubDecode` for an actual codec and nothing
  * else changes. At 100 TB the payload column never shuffles: metadata is
  * extracted first (narrow), and only the small metadata projection
  * participates in joins/aggregations.
  */
object Binary {
  /** Metadata schema attached to every decoded payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** STUB decoder: derives deterministic fake dimensions from the payload
    * length (a real implementation would parse the image header here).
    */
  def stubDecode(payload: Array[Byte]): (Long, Int, Int, Int) = {
    val n = payload.length.toLong
    val width = (n % 640L).toInt + 1
    val height = (n % 480L).toInt + 1
    (n, width, height, 3)
  }

  /** Per-partition batched metadata extraction over (id, payload) rows.
    * Mirrors the batch shape of an Arrow-based vectorized decode: the
    * iterator is consumed lazily per batch, nothing is materialized on the
    * driver.
    */
  def extractMeta(spark: SparkSession, df: DataFrame, idCol: String, payloadCol: String,
                  batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +: metaSchema.fields.toSeq)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(idIdx)
          val payload = row.getAs[Array[Byte]](pIdx)
          val (n, w, h, c) = stubDecode(payload)
          Row(id, n, w, h, c)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic frame/patch sampling: slice the payload at a fixed byte
    * stride (capped frame count) — the plumbing for "sample every Nth video
    * frame", with the per-frame decode stubbed to an md5 of the slice.
    * Narrow: explode multiplies rows but never shuffles the payload.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, stride: Int, maxFrames: Int): DataFrame = {
    val nFrames = least(
      ceil(length(col(payloadCol)).cast("double") / stride).cast("int"),
      lit(maxFrames))
    df.withColumn("frame_idx", explode(sequence(lit(0), greatest(nFrames, lit(1)) - 1)))
      .withColumn("frame_offset", col("frame_idx") * stride)
      .withColumn("frame_md5",
        md5(expr(s"substring($payloadCol, frame_offset + 1, $stride)")))
  }
}
