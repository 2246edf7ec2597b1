package graft.operators

import graft.SparkTestSession
import graft.cdc.Cdc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("maintained view equals recompute over the merged table, 50 random scenarios") {
    val rnd = new scala.util.Random(95)
    (1 to 50).foreach { trial =>
      def rows(n: Int, del: Boolean) = Seq.fill(n)((
        rnd.nextLong(30),
        s"g${rnd.nextInt(4)}",
        math.round(rnd.nextDouble() * 10000) / 100.0,
        if (del && rnd.nextInt(4) == 0) "Y" else "N"))
        .groupBy(_._1).map(_._2.head).toSeq // unique PKs
      val target = rows(rnd.nextInt(20), del = false)
        .toDF("id", "g", "v", "is_deleted")
      val staged = rows(rnd.nextInt(15), del = true)
        .toDF("id", "g", "v", "is_deleted")

      val state = Ivm.sumCountView(target, "g", "v")
      val maintained = Ivm.maintainSumCount(state, target, staged, Seq("id"), "g", "v")
        .select(col("g"), col("sum_val").cast("decimal(22,2)").cast("string"), col("n_rows"))
        .as[(String, String, Long)].collect().sortBy(_._1).toSeq

      val recomputed = Ivm.sumCountView(
          Cdc.mergeSoftDelete(target, staged, Seq("id")), "g", "v")
        .select(col("g"), col("sum_val").cast("decimal(22,2)").cast("string"), col("n_rows"))
        .as[(String, String, Long)].collect().sortBy(_._1).toSeq

      assert(maintained == recomputed, s"trial $trial")
    }
  }

  test("derived AVG on maintained state equals AVG on recompute, 20 random scenarios") {
    val rnd = new scala.util.Random(112)
    (1 to 20).foreach { trial =>
      def rows(n: Int, del: Boolean) = Seq.fill(n)((
        rnd.nextLong(30),
        s"g${rnd.nextInt(4)}",
        math.round(rnd.nextDouble() * 10000) / 100.0,
        if (del && rnd.nextInt(4) == 0) "Y" else "N"))
        .groupBy(_._1).map(_._2.head).toSeq
      val target = rows(5 + rnd.nextInt(15), del = false).toDF("id", "g", "v", "is_deleted")
      val staged = rows(rnd.nextInt(10), del = true).toDF("id", "g", "v", "is_deleted")
      def snap(df: org.apache.spark.sql.DataFrame) = Ivm.withAvg(df)
        .select(col("g"), col("avg_val").cast("string"))
        .as[(String, String)].collect().sortBy(_._1).toSeq
      val maintained = snap(Ivm.maintainSumCount(
        Ivm.sumCountView(target, "g", "v"), target, staged, Seq("id"), "g", "v"))
      val recomputed = snap(Ivm.sumCountView(
        Cdc.mergeSoftDelete(target, staged, Seq("id")), "g", "v"))
      assert(maintained == recomputed, s"trial $trial")
    }
  }

  test("MIN/MAX maintenance is rejected with the documented contract") {
    val e = intercept[UnsupportedOperationException](Ivm.maintainMinMax("MIN"))
    assert(e.getMessage.contains("not self-maintainable"))
  }

  test("retraction handles a target row that was already soft-deleted") {
    // a staged update to an already-deleted row must not retract anything
    val target = Seq((1L, "g", 10.0, "Y"), (2L, "g", 5.0, "N")).toDF("id", "g", "v", "is_deleted")
    val staged = Seq((1L, "g", 20.0, "N")).toDF("id", "g", "v", "is_deleted") // undelete
    val state = Ivm.sumCountView(target, "g", "v")
    val got = Ivm.maintainSumCount(state, target, staged, Seq("id"), "g", "v")
      .as[(String, java.math.BigDecimal, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2.doubleValue, r._3)) == Seq(("g", 25.0, 2L)))
  }
}
