package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names, for local iteration
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.get(cpus.toInt)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracle = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
    val json = oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Hard-signal guard: the driver's gate silently zeroes the round if
    // this file is empty or unparseable. Re-read what was written and
    // strict-parse it (Jackson ships with Spark); refuse to exit 0 unless
    // it is a non-empty object with exactly the keys we meant to write.
    val written = Files.readString(Paths.get(s"$outDir/oracle_sql.json"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node =
      try mapper.readTree(written)
      catch { case e: Throwable =>
        System.err.println(s"[verify] FATAL: oracle_sql.json unparseable: ${e.getMessage}")
        spark.stop(); sys.exit(2)
      }
    if (!node.isObject || node.size() != oracle.size || (only.isEmpty && node.size() == 0)) {
      System.err.println(s"[verify] FATAL: oracle_sql.json has ${node.size()} keys, expected ${oracle.size}")
      spark.stop(); sys.exit(2)
    }
    spark.stop()
  }
}
