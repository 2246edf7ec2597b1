package graft.cdc

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("withCdcColumns adds only missing tracking columns") {
    val df = Seq((1, "x")).toDF("id", "v")
    val out = Cdc.withCdcColumns(df, now = lit("2024-01-01 00:00:00").cast("timestamp"))
    assert(out.columns.toSeq == Seq("id", "v", "created_at", "updated_at", "is_deleted"))
    val again = Cdc.withCdcColumns(out)
    assert(again.columns.length == out.columns.length)
    val r = out.head()
    assert(r.getAs[String]("is_deleted") == "N")
    assert(r.isNullAt(r.fieldIndex("updated_at")))
  }

  test("changeTs = greatest(coalesce(updated, created), created)") {
    val df = Seq(
      ("a", "2024-01-01 00:00:00", Some("2024-02-01 00:00:00")),
      ("b", "2024-01-05 00:00:00", None),
      ("c", "2024-03-01 00:00:00", Some("2024-01-01 00:00:00"))) // updated < created
      .toDF("k", "c", "u")
      .select(col("k"), col("c").cast("timestamp").as("c"), col("u").cast("timestamp").as("u"))
    val got = df.select(col("k"), Cdc.changeTs(col("c"), col("u")).cast("string").as("ts"))
      .as[(String, String)].collect().toMap
    assert(got("a") == "2024-02-01 00:00:00")
    assert(got("b") == "2024-01-05 00:00:00")
    assert(got("c") == "2024-03-01 00:00:00")
  }

  test("deltaSince: None = full load, Some = strictly-after filter") {
    val df = Seq(1, 2, 3, 4).toDF("ts_i")
    assert(Cdc.deltaSince(df, col("ts_i"), None).count() == 4)
    assert(Cdc.deltaSince(df, col("ts_i"), Some(lit(2))).count() == 2)
  }

  test("latestPerKey keeps one latest row per key") {
    val df = Seq((1, 10, "old"), (1, 20, "new"), (2, 5, "only")).toDF("k", "seq", "v")
    val got = Cdc.latestPerKey(df, Seq("k"), Seq(col("seq")))
      .select("k", "v").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "new", 2 -> "only"))
  }

  test("mergeSoftDelete: update matched, insert unless deleted, keep unmatched") {
    val target = Seq((1, "a", "N"), (2, "b", "N")).toDF("id", "v", "is_deleted")
    val staged = Seq(
      (2, "b2", "N"),  // update
      (3, "c", "N"),   // insert
      (4, "d", "Y"),   // deleted-before-seen: NOT inserted
      (1, "a", "Y"))   // soft delete of existing row: kept, flagged
      .toDF("id", "v", "is_deleted")
    val got = Cdc.mergeSoftDelete(target, staged, Seq("id"))
      .orderBy("id").as[(Int, String, String)].collect().toSeq
    assert(got == Seq((1, "a", "Y"), (2, "b2", "N"), (3, "c", "N")))
  }

  test("scd2 assigns versions and flags current") {
    val df = Seq((1, 10), (1, 20), (1, 30), (2, 5)).toDF("k", "seq")
    val got = Cdc.scd2(df, Seq("k"), Seq(col("seq")))
      .select("k", "seq", "version", "is_current")
      .as[(Int, Int, Int, Boolean)].collect().toSet
    assert(got == Set((1, 10, 1, false), (1, 20, 2, false), (1, 30, 3, true), (2, 5, 1, true)))
  }

  test("watermarks advance monotonically") {
    val cur = Seq(("t1", "2024-01-10"), ("t2", "2024-05-01")).toDF("entity", "d")
      .select(col("entity"), col("d").cast("timestamp").as("last_ts"))
    val delta = Seq(("t1", "2024-02-01"), ("t2", "2024-01-01"), ("t3", "2024-03-01"))
      .toDF("entity", "d")
      .select(col("entity"), col("d").cast("timestamp").as("ts"))
    val computed = Watermarks.compute(delta, col("entity"), col("ts"))
    val got = Watermarks.advance(cur, computed)
      .select(col("entity"), col("last_ts").cast("string"))
      .as[(String, String)].collect().toMap
    assert(got("t1").startsWith("2024-02-01")) // advanced
    assert(got("t2").startsWith("2024-05-01")) // NOT moved backwards
    assert(got("t3").startsWith("2024-03-01")) // new entity
  }

  test("mergeSoftDelete property: 200 random scenarios match a model merge") {
    val rnd = new scala.util.Random(91)
    (1 to 200).foreach { trial =>
      val keys = 0L until (1 + rnd.nextInt(12))
      def randRows(n: Int) = Seq.fill(n)((
        keys(rnd.nextInt(keys.size)),
        s"v${rnd.nextInt(5)}",
        if (rnd.nextBoolean()) "N" else "Y"))
      val target = randRows(rnd.nextInt(10)).groupBy(_._1).map(_._2.head).toSeq
      val stagedRows = randRows(rnd.nextInt(10)).groupBy(_._1).map(_._2.head).toSeq
      // model: matched keys take staged values wholesale; unmatched staged
      // rows insert only when not deleted; unmatched target rows survive
      val stagedMap = stagedRows.map(r => r._1 -> r).toMap
      val expect = (target.map { t =>
        stagedMap.getOrElse(t._1, t)
      } ++ stagedRows.filterNot(s =>
        target.exists(_._1 == s._1)).filter(_._3 == "N")).sortBy(_._1)
      val got = Cdc.mergeSoftDelete(
          target.toDF("id", "v", "is_deleted"),
          stagedRows.toDF("id", "v", "is_deleted"), Seq("id"))
        .as[(Long, String, String)].collect().sortBy(_._1).toSeq
      assert(got == expect, s"trial $trial target=$target staged=$stagedRows")
    }
  }

  test("tableChecksum: order-free, null-safe, and sensitive to any row drift") {
    def ck(df: org.apache.spark.sql.DataFrame): (Long, String) =
      Cdc.tableChecksum(df, Seq("id", "v")).as[(Long, String)].head()
    val base = Seq((1L, Some("x")), (2L, Some("y")), (3L, None)).toDF("id", "v")
    val same = ck(base)
    assert(ck(base.repartition(7)) == same, "row order/partitioning must not matter")
    assert(ck(Seq((3L, None), (1L, Some("x")), (2L, Some("y"))).toDF("id", "v")) == same)
    // one changed value, one missing row, one extra row — all must shift it
    assert(ck(Seq((1L, Some("x")), (2L, Some("Y")), (3L, None)).toDF("id", "v")) != same)
    assert(ck(base.filter(col("id") =!= 2)) != same)
    assert(ck(base.unionByName(Seq((4L, Some("w"))).toDF("id", "v"))) != same)
    // null is distinct from the empty string
    assert(ck(Seq((1L, Some("x")), (2L, Some("y")), (3L, Some(""))).toDF("id", "v")) != same)
  }

  test("asOfSnapshot picks the latest change at-or-before the point, per key") {
    val hist = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 25L, "x"),
      (3L, 5L, "p"), (3L, 20L, "q")
    ).toDF("id", "ts", "v")
    val snap = Cdc.asOfSnapshot(hist, Seq("id"), Seq("ts"), col("ts") <= 20L)
      .as[(Long, Long, String)].collect().toSet
    // key 2's first change is AFTER the point: absent; ties impossible here
    assert(snap == Set((1L, 20L, "b"), (3L, 20L, "q")))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val older = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val newer = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "v")
    val got = Cdc.snapshotDiff(older, newer, Seq("id"), Seq("v"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("vacuumTombstones purges only tombstones past retention") {
    // high watermark = 2024-06-01; retention 30d -> cutoff 2024-05-02
    val r = Seq(
      (1L, "2024-06-01 00:00:00", "N"), // live, recent
      (2L, "2023-01-01 00:00:00", "N"), // live, ancient: NEVER purged
      (3L, "2024-05-20 00:00:00", "Y"), // tombstone inside retention
      (4L, "2024-04-01 00:00:00", "Y")) // tombstone past retention: purged
      .toDF("id", "ts_s", "is_deleted")
      .select(col("id"), col("ts_s").cast("timestamp").as("change_ts"),
        col("is_deleted"))
    val got = Cdc.vacuumTombstones(r, col("change_ts"), retentionDays = 30)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("vacuumTombstones watermark is data-derived: a stale replica keeps all") {
    // every row is old, but the watermark is old TOO — nothing purges,
    // which is the point (consumers may not have seen these deletes)
    val r = Seq((1L, "2020-01-01 00:00:00", "Y"), (2L, "2020-01-10 00:00:00", "Y"))
      .toDF("id", "ts_s", "is_deleted")
      .select(col("id"), col("ts_s").cast("timestamp").as("change_ts"),
        col("is_deleted"))
    assert(Cdc.vacuumTombstones(r, col("change_ts"), 30).count() == 2)
  }
}
