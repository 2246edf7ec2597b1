package graft.sources

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** F17: zstd-compressed JSONL source/sink — the de-facto interchange
  * format large text corpora actually ship in (The Pile, RedPajama,
  * CommonCrawl derivatives all distribute `*.jsonl.zst` shards).
  * Spark's own text/json readers know gzip/bzip2/snappy through the
  * Hadoop codec registry but NOT zstd-framed text on every install;
  * this implements the contract directly on `zstd-jni`, which already
  * ships on Spark's classpath (Parquet's zstd codec uses it).
  *
  * Scale shape: READ parallelizes file-at-a-time — the file list is
  * driver metadata, each task streams its shard through a
  * `ZstdInputStream` (sequential frame decode, constant memory —
  * a zstd frame is not block-splittable without the seekable-format
  * extension, so parallelism is bounded by shard count, which is how
  * these corpora are published: many shards of a few hundred MB).
  * Line parsing stays in Spark SQL (`spark.read.json` over the line
  * dataset — the codegen'd Jackson path, FAILFAST so corrupt records
  * are loud, not silently nulled). WRITE emits one `.jsonl.zst` shard
  * per partition through the Hadoop FileSystem API, rows serialized
  * by Spark's own JSON writer (`df.toJSON`), so the writer parallelism
  * and the reader parallelism stay in step. Truncated or corrupt
  * frames throw from zstd-jni — never a silent short read.
  */
object ZstdJsonl {

  /** Write `df` as one `part-NNNNN.jsonl.zst` shard per partition
    * under `dir` (level-3 frames, the corpus-publishing default).
    */
  def write(df: DataFrame, dir: String): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new Path(dir)
    out.getFileSystem(conf.value).mkdirs(out)
    df.toJSON.rdd.mapPartitionsWithIndex { (idx, lines) =>
      val p = new Path(dir, f"part-$idx%05d.jsonl.zst")
      val stream = p.getFileSystem(conf.value).create(p, true)
      val w = new BufferedWriter(new OutputStreamWriter(
        new ZstdOutputStream(stream, 3), UTF_8))
      var n = 0L
      lines.foreach { l => w.write(l); w.write('\n'); n += 1 }
      w.close()
      Iterator.single(n)
    }.count(): Unit
  }

  /** All decompressed lines under `dir` (`*.jsonl.zst`), one read task
    * per shard — the raw-text layer, exposed so callers can route
    * lines into any parser.
    */
  def lines(spark: SparkSession, dir: String): Dataset[String] = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".jsonl.zst"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no .jsonl.zst shards under $dir")
    import spark.implicits._
    spark.sparkContext.parallelize(files, math.max(1, files.size))
      .flatMap { file =>
        val p = new Path(file)
        val in = p.getFileSystem(conf.value).open(p)
        val r = new BufferedReader(new InputStreamReader(
          new ZstdInputStream(in), UTF_8))
        // close on task completion too: an early-terminated scan (limit)
        // never exhausts the iterator and would leak the stream
        var closed = false
        def closeAll(): Unit =
          if (!closed) { closed = true; r.close(); in.close() }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeAll())
        new Iterator[String] {
          private var nextLine = r.readLine()
          def hasNext: Boolean = {
            val h = nextLine != null
            if (!h) closeAll()
            h
          }
          def next(): String = {
            val l = nextLine; nextLine = r.readLine(); l
          }
        }
      }.toDS()
  }

  /** Read every shard under `dir` against an explicit `schema`
    * (corpus schemas are contracts, not guesses), FAILFAST on any
    * malformed line.
    */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST")
      .json(lines(spark, dir))
}
