package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F17b: zstd DICTIONARY compression — the petabyte-corpus storage
  * trick: many small documents share structure, so a dictionary
  * trained on a corpus sample cuts per-document compressed size far
  * below what document-at-a-time compression reaches (the zstd
  * `--train` workflow, via zstd-jni off Spark's own classpath — the
  * F17 precedent).
  *
  * Scale shape: TRAINING is a bounded-sample, driver-sized operation
  * BY DESIGN (the trainer itself is in-memory; `maxSamples` caps the
  * collect — stated, the one deliberate driver touch); COMPRESSION and
  * DECOMPRESSION are fully distributed — the dictionary broadcasts as
  * plain bytes and each partition holds one reusable JNI context.
  */
object ZstdDict {

  /** Train a dictionary of `dictSize` bytes on up to `maxSamples`
    * payloads (driver-side sample, stated bound).
    */
  def train(samples: DataFrame, payload: Column, dictSize: Int,
            maxSamples: Int = 4096): Array[Byte] = {
    val rows = samples.select(payload.as("p")).limit(maxSamples)
      .collect().map(_.getAs[Array[Byte]](0)).filter(_ != null)
    require(rows.nonEmpty, "no samples to train a zstd dictionary on")
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(
      rows.map(_.length).sum, dictSize)
    rows.foreach(trainer.addSample)
    trainer.trainSamples()
  }

  /** `(id, payload)` → `(id, z)` compressed with the dictionary — one
    * reusable context per partition, level 3.
    */
  def compress(df: DataFrame, id: Column, payload: Column,
               dict: Array[Byte]): DataFrame = {
    val in = df.select(id.as("id"), payload.as("payload"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        in.schema.fields(0).dataType),
      org.apache.spark.sql.types.StructField("z",
        org.apache.spark.sql.types.BinaryType)))
    val rdd = in.rdd.mapPartitions { rows =>
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      ctx.loadDict(dict)
      ctx.setLevel(3)
      rows.map { r =>
        org.apache.spark.sql.Row(r.get(0),
          ctx.compress(r.getAs[Array[Byte]](1)))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** `(id, z)` → `(id, payload)` — the inverse of [[compress]]. */
  def decompress(df: DataFrame, id: Column, z: Column,
                 dict: Array[Byte]): DataFrame = {
    val in = df.select(id.as("id"), z.as("z"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        in.schema.fields(0).dataType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType)))
    val rdd = in.rdd.mapPartitions { rows =>
      val ctx = new com.github.luben.zstd.ZstdDecompressCtx()
      ctx.loadDict(dict)
      rows.map { r =>
        val zb = r.getAs[Array[Byte]](1)
        val n = com.github.luben.zstd.Zstd.getFrameContentSize(zb)
        require(n >= 0 && n <= Int.MaxValue, s"bad zstd frame size $n")
        org.apache.spark.sql.Row(r.get(0), ctx.decompress(zb, n.toInt))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
