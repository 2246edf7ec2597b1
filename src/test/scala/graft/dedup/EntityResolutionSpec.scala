package graft.dedup

import graft.{QueriesR4, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E1 entity-resolution blocking contract (r8 scale-safe rewrite).
  *
  * The r4 fixed-3-char-prefix key had block populations growing linearly
  * with n (every custkey sharing a 3-digit prefix landed in one block), so
  * the in-block pair join was quadratic at scale. The r8 prefix-FAMILY key
  * (digit prefix truncated by ≤ 2 trailing chars, floored at min(3, d))
  * bounds every block by construction: a key of length L is only emitted
  * by digit strings of length L..L+2 that extend it — at most
  * 1 + 10 + 100 = 111 masters plus their ≤ 111 injected variants.
  */
class EntityResolutionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def maxBlock(dir: String): Long = {
    val keyed = QueriesR4.erKeyed(QueriesR4.erEntities(spark, dir))
    keyed.groupBy("blk").count().agg(max("count")).head().getLong(0)
  }

  test("block size is bounded by 222 independent of scale") {
    // The bound is absolute (1+10+100 masters + their variants), not a
    // function of n: the r4 fixed-3-char key instead grew every block
    // linearly with n. At tiny SFs blocks are far below the cap (digit
    // strings are short); the cap is what a 100x scale-up must respect.
    val m1 = maxBlock("/root/testdata/sf0.001")
    val m2 = maxBlock("/root/testdata/sf0.01")
    assert(m1 <= 222, s"sf0.001 max block $m1")
    assert(m2 <= 222, s"sf0.01 max block $m2")
    // synthetic 100x check: keys for digit strings 1..150000 (d up to 6)
    // still respect the cap even when every length-3..6 family is full
    val synth = spark.range(1, 150001)
      .selectExpr("id AS ent_id",
        "concat(cast(id AS string), '## master entity record alpha') AS name")
    val mBig = QueriesR4.erKeyed(synth)
      .groupBy("blk").count().agg(max("count")).head().getLong(0)
    assert(mBig <= 222, s"synthetic 150k-entity max block $mBig")
  }

  test("blocking recall is exact for injected variants") {
    val dir = "/root/testdata/sf0.01"
    val keyed = QueriesR4.erKeyed(QueriesR4.erEntities(spark, dir))
    // every variant (ent_id >= 1e6) must share >=1 key with its master
    val masters = keyed.select(col("ent_id").as("mid"), col("blk"))
    val variants = keyed.filter(col("ent_id") >= 1000000L)
      .select((col("ent_id") - 1000000L).as("vid"), col("blk").as("vblk"))
    val nVariants = variants.select("vid").distinct().count()
    val covered = variants.join(masters,
      col("vid") === col("mid") && col("vblk") === col("blk"))
      .select("vid").distinct().count()
    assert(nVariants > 0 && covered == nVariants,
      s"$covered of $nVariants variants blocked with their master")
  }

  test("deliberate naive-key false merge survives: 123 clusters with 1230") {
    val dir = "/root/testdata/sf0.01"
    val out = QueriesR4.entityResolution(spark, dir)
      .filter(col("ent_id").isin(123L, 1230L))
      .select("ent_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(123L) == out(1230L), s"prefix-family merge lost: $out")
  }
}
