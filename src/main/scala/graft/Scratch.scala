package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time named queries twice (cold/warm) at a chosen
  * scale factor. Not part of the driver contract.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        println(f"[scratch] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
