package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** X20/F11: exactly-once streaming CDC apply into Derby — the ledger
  * makes epoch re-delivery a no-op even for non-idempotent effects.
  */
class JdbcStreamSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val conn = Jdbc.Conn(
    url = s"jdbc:derby:memory:graftsink;create=true",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  test("ensureEpochTable is idempotent") {
    JdbcStreamSink.ensureEpochTable(conn)
    JdbcStreamSink.ensureEpochTable(conn)
  }

  test("applyEpochOnce runs a NON-idempotent effect exactly once per epoch") {
    JdbcStreamSink.ensureEpochTable(conn)
    JdbcMerge.execute(conn, "CREATE TABLE audit_rows (v BIGINT)")
    def fire(epoch: Long) = JdbcStreamSink.applyEpochOnce(conn, "q_audit", epoch) {
      c => val st = c.createStatement()
        try st.executeUpdate("INSERT INTO audit_rows VALUES (1)") finally st.close()
    }
    assert(fire(0L));  assert(!fire(0L)); assert(fire(1L)); assert(!fire(1L))
    val n = Jdbc.read(spark, conn, "audit_rows").count()
    assert(n == 2L, s"re-delivered epochs must not re-apply, saw $n rows")
  }

  test("a failed apply rolls back its ledger mark and can retry") {
    JdbcStreamSink.ensureEpochTable(conn)
    intercept[RuntimeException] {
      JdbcStreamSink.applyEpochOnce(conn, "q_fail", 7L) { _ =>
        throw new RuntimeException("apply crashed")
      }
    }
    // the crash rolled back the marker, so the retry applies
    assert(JdbcStreamSink.applyEpochOnce(conn, "q_fail", 7L) { _ => () })
  }

  test("streamed CDC delta merges into the target; a full replay changes nothing") {
    JdbcMerge.execute(conn,
      "CREATE TABLE sink_target (ID BIGINT PRIMARY KEY, V VARCHAR(20), IS_DELETED VARCHAR(1))")
    JdbcMerge.execute(conn,
      "CREATE TABLE sink_staging (ID BIGINT, V VARCHAR(20), IS_DELETED VARCHAR(1))")
    JdbcMerge.execute(conn, "INSERT INTO sink_target VALUES (1, 'old', 'N')")
    val delta = Seq((1L, "updated", "N"), (2L, "new", "N"), (3L, "dead", "Y"))
      .toDF("ID", "V", "IS_DELETED")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsink").toString
    delta.coalesce(1).write.mode("overwrite").parquet(s"$dir/in")

    def run(qn: String) = JdbcStreamSink.streamCdcApplyJdbc(spark, s"$dir/in",
      delta.schema, conn, "sink_target", "sink_staging", Seq("ID"), qn)

    assert(run("q_sink") == 1L)
    val rows = Jdbc.read(spark, conn, "sink_target")
      .as[(Long, String, String)].collect().toSet
    assert(rows == Set((1L, "updated", "N"), (2L, "new", "N")),
      "matched updated, unmatched-live inserted, soft-deleted not inserted")
    // restart WITHOUT a checkpoint: epoch 0 re-delivers, ledger skips it
    assert(run("q_sink") == 0L)
    assert(Jdbc.read(spark, conn, "sink_target").count() == 2L)
  }
}
