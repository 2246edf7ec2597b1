package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        println(f"[scratch] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    Seq("q_sample_hash", "q1_pricing_summary", "fk_orphan_check", "q_semi_anti",
        "ann_bruteforce_topk", "dedup_embed_cosine", "q_sessionize").foreach(time)
    println("=== q_sample_hash plan ===")
    SparkEntry.queries("q_sample_hash")(spark, dir).explain("formatted")
    spark.stop()
  }
}
