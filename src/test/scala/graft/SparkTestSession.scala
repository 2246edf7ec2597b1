package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (JVM is forked once per test run). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(cores = 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
