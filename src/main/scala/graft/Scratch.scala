package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time named queries twice (cold/warm) at a chosen
  * scale factor. Not part of the driver contract.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
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

/** Micro-benchmark for the native grouped top-k operator: 50M synthetic
  * rows, 1000 groups, k=100 — the regime where the per-row buffer-insert
  * cost dominates (the gate query's k=3 over orders is too small to show
  * it). Prints best-of-3 wall time; used to size the r4/r5 buffer-path
  * changes.
  */
object ScratchTopK {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val df = spark.range(n).select(
      (col("id") % 1000).as("grp"),
      ((col("id") * 2654435761L) % 1000000007L).cast("double").as("score"),
      col("id"))
    val times = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      val c = graft.plans.GroupedTopK.topK(df, Seq("grp"),
        col("score"), col("id"), k = 100, rankName = "rnk").count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[topk-micro] run$i $s%.2f s (rows out $c)")
      s
    }
    println(f"[topk-micro] best ${times.min}%.2f s over $n rows")
    spark.stop()
  }
}

/** Dev profiling: stage-by-stage timing of the semantic-dedup chain. */
object ScratchSem {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[sem] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    (1 to 2).foreach { _ =>
      val e = graft.sources.Tables.load(spark, dir, "embeddings")
      tm("kmeans") { graft.similarity.KMeans.lloydMilliK(e,
        col("vec_id"), col("embedding"), k = 10, iterations = 2).count() }
      tm("full") { SparkEntry.queries("dedup_semantic")(spark, dir).count() }
    }
    spark.stop()
  }
}
