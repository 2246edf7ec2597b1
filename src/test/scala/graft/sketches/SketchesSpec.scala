package graft.sketches

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ───────────────────────────── KMV ─────────────────────────────

  test("kmv: below k the sketch is exact") {
    val buf = (1 to 40).foldLeft(Array.emptyLongArray)((b, i) =>
      Kmv.insert(b, i * 1000L, 64))
    assert(Kmv.estimate(buf, 64) == 40L)
  }

  test("kmv: insert keeps the k smallest distinct, sorted") {
    val rnd = new scala.util.Random(11)
    val vals = Array.fill(5000)(rnd.nextLong(1L << 48))
    val buf = vals.foldLeft(Array.emptyLongArray)((b, v) => Kmv.insert(b, v, 32))
    val expect = vals.distinct.sorted.take(32)
    assert(buf.toSeq == expect.toSeq)
  }

  test("kmv: union == sketch of concatenation (mergeable, order-free)") {
    val rnd = new scala.util.Random(12)
    def sk(vs: Seq[Long]) = vs.foldLeft(Array.emptyLongArray)((b, v) => Kmv.insert(b, v, 16))
    val a = Seq.fill(300)(rnd.nextLong(1L << 48))
    val b = Seq.fill(300)(rnd.nextLong(1L << 48))
    assert(Kmv.union(sk(a), sk(b), 16).toSeq == sk(a ++ b).toSeq)
    assert(Kmv.union(sk(b), sk(a), 16).toSeq == sk(a ++ b).toSeq)
  }

  test("kmv: estimator lands within 3σ of the truth") {
    val k = 256
    val n = 100000
    // deterministic md5-derived hashes, as production uses
    val df = spark.range(n).select(Kmv.hash48(col("id")).as("h"))
    val est = df.agg(Kmv.kmvDistinct(col("h"), k)).as[Long].head()
    val sigma = n / math.sqrt(k - 2.0)
    assert(math.abs(est - n) < 3 * sigma, s"est=$est n=$n 3σ=${3 * sigma}")
  }

  test("kmv: estimate is identical under any partitioning (deterministic merge)") {
    val df = spark.range(20000).select((col("id") % 500).as("g"), Kmv.hash48(col("id")).as("h"))
    def run(parts: Int) =
      df.repartition(parts).groupBy("g").agg(Kmv.kmvDistinct(col("h"), 32).as("e"))
        .as[(Long, Long)].collect().toMap
    assert(run(1) == run(13))
  }

  // ──────────────────────────── HLL ────────────────────────────

  test("hll: estimate within 3σ on 100k distinct values") {
    val df = spark.range(100000).toDF("v")
    val regs = Hll.registers(df.withColumn("g", lit("all")), "g", col("v"))
    val denom = Hll.digest(regs, "g").select("hll_denom").as[Long].head()
    val est = Hll.estimate(denom)
    val sigma = 1.04 / math.sqrt(Hll.M) * 100000
    assert(math.abs(est - 100000) < 3 * sigma, s"est=$est 3σ=${3 * sigma}")
  }

  test("hll: merge of shard registers equals registers of the union") {
    val a = spark.range(0, 30000).toDF("v").withColumn("g", lit("x"))
    val b = spark.range(20000, 60000).toDF("v").withColumn("g", lit("x"))
    val merged = Hll.merge("g",
      Hll.registers(a, "g", col("v")), Hll.registers(b, "g", col("v")))
      .orderBy("bucket").as[(String, Int, Int)].collect().toSeq
    val whole = Hll.registers(a.unionByName(b), "g", col("v"))
      .orderBy("bucket").as[(String, Int, Int)].collect().toSeq
    assert(merged == whole && merged.size <= Hll.M)
  }

  test("hll: persisted registers + a new day of data equals full recompute (incremental)") {
    // the point of a mergeable sketch: yesterday's state is 256 ints on
    // disk, today's update never re-reads yesterday's rows
    val day1 = spark.range(0, 40000).toDF("v").withColumn("g", lit("corpus"))
    val day2 = spark.range(30000, 70000).toDF("v").withColumn("g", lit("corpus"))
    val store = java.nio.file.Files.createTempDirectory("graft_hll_state").toString
    Hll.registers(day1, "g", col("v")).write.mode("overwrite").parquet(store)
    val restored = spark.read.parquet(store)
    val merged = Hll.merge("g", restored, Hll.registers(day2, "g", col("v")))
    val whole = Hll.registers(day1.unionByName(day2), "g", col("v"))
    assert(Hll.digest(merged, "g").collect().toSeq ==
      Hll.digest(whole, "g").collect().toSeq)
  }

  test("hll: digest is exact-deterministic under any partitioning") {
    val df = spark.range(50000)
      .select((col("id") % 7).cast("string").as("g"), col("id").as("v"))
    def run(parts: Int) =
      Hll.digest(Hll.registers(df.repartition(parts), "g", col("v")), "g")
        .as[(String, Long, Long, Long)].collect().toSet
    assert(run(1) == run(17))
  }

  // ───────────────────────── count-min ─────────────────────────

  test("count-min: never underestimates, overshoot bounded, merge = whole") {
    val df = spark.range(30000)
      .select(when(col("id") % 3 === 0, col("id") % 20)
        .otherwise(col("id")).as("item"))
    val exact = df.groupBy("item").count()
      .as[(Long, Long)].collect().toMap
    val sk = CountMin.counters(df, col("item"))
    val probes = spark.range(20).toDF("item")
    val est = CountMin.estimate(sk, probes, "item")
      .as[(Long, Long)].collect().toMap
    (0L until 20L).foreach { i =>
      val truth = exact.getOrElse(i, 0L)
      assert(est(i) >= truth, s"CM must never underestimate: item $i")
      // overshoot ≤ n/width with slack 8 (collision sum, not expectation)
      assert(est(i) - truth <= 8L * 30000 / CountMin.Width, s"overshoot item $i: ${est(i)} vs $truth")
    }
    // merging shard sketches equals the whole-corpus sketch, counter-exact
    val a = df.filter(col("item") % 2 === 0)
    val b = df.filter(col("item") % 2 =!= 0)
    val merged = CountMin.merge(
      CountMin.counters(a, col("item")), CountMin.counters(b, col("item")))
      .orderBy("d", "bucket").as[(Int, Long, Long)].collect().toSeq
    val whole = sk.orderBy("d", "bucket").as[(Int, Long, Long)].collect().toSeq
    assert(merged == whole)
  }

  // ───────────────────────── Misra-Gries ─────────────────────────

  private def mgGuaranteesHold(counts: Map[Long, Long], sketch: Map[Long, Long],
                               n: Long, k: Int): Unit = {
    counts.foreach { case (item, cnt) =>
      if (cnt * k > n) {
        assert(sketch.contains(item), s"heavy item $item (count $cnt, n=$n) missing")
      }
      val est = sketch.getOrElse(item, 0L)
      assert(est <= cnt, s"overestimate for $item: $est > $cnt")
      assert(est * k >= cnt * k - n, s"underestimate beyond n/k for $item")
    }
  }

  test("misra-gries: guarantees hold on a skewed stream, single and sharded builds") {
    val k = 16
    val rnd = new scala.util.Random(61)
    // 40% of mass on 4 items, the rest long-tail
    val stream = Seq.fill(30000)(
      if (rnd.nextDouble() < 0.4) rnd.nextLong(4) else 100 + rnd.nextLong(5000))
    val counts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = new FreqItems.FreqAgg(k)
    val single = stream.foldLeft(agg.zero)(agg.reduce)
    mgGuaranteesHold(counts, single, stream.size, k)
    // arbitrary merge tree must preserve the guarantees
    val sharded = stream.grouped(1000).map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    assert(sharded.size < k)
    mgGuaranteesHold(counts, sharded, stream.size, k)
  }

  test("misra-gries: dataframe aggregate retains every heavy item") {
    val df = spark.range(20000).select(
      when(col("id") % 2 === 0, col("id") % 5)
        .otherwise(col("id") + 1000000).cast("long").as("item"))
      .repartition(8)
    val sk = df.agg(FreqItems.freqItems(col("item"), 16).as("sk"))
      .as[Map[Long, Long]].head()
    // items 0..4 each carry ~10% of rows > n/16
    (0L to 4L).foreach(i => assert(sk.contains(i), s"heavy item $i missing from $sk"))
  }

  // ─────────────────────────── t-digest ───────────────────────────

  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val i = java.util.Arrays.binarySearch(sorted, v)
    val pos = if (i >= 0) i else -i - 1
    pos.toDouble / sorted.length
  }

  test("tdigest: rank error under 1% on uniform data at p50/p90/p99") {
    val rnd = new scala.util.Random(21)
    val vals = Array.fill(50000)(rnd.nextDouble() * 1000)
    val st = vals.foldLeft(TDigest.State.empty)((s, v) =>
      new TDigest.TDigestAgg(Seq(0.5)).reduce(s, v))
    val sorted = vals.sorted
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val est = TDigest.quantile(st, q)
      assert(math.abs(rankOf(sorted, est) - q) < 0.01, s"q=$q est=$est")
    }
  }

  test("tdigest: merged shards match single digest accuracy (lognormal)") {
    val rnd = new scala.util.Random(22)
    val vals = Array.fill(40000)(math.exp(rnd.nextGaussian() * 2))
    val agg = new TDigest.TDigestAgg(Seq(0.5))
    val shards = vals.grouped(2500).map(_.foldLeft(TDigest.State.empty)(agg.reduce)).toSeq
    val merged = shards.reduce(agg.merge)
    val sorted = vals.sorted
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = TDigest.quantile(merged, q)
      assert(math.abs(rankOf(sorted, est) - q) < 0.01, s"q=$q est=$est")
    }
  }

  test("tdigest: quantile estimates are monotone in q") {
    val rnd = new scala.util.Random(23)
    val agg = new TDigest.TDigestAgg(Seq(0.5))
    val st = Array.fill(10000)(rnd.nextGaussian()).foldLeft(TDigest.State.empty)(agg.reduce)
    val qs = (0 to 20).map(_ / 20.0)
    val ests = qs.map(q => TDigest.quantile(st, q))
    assert(ests == ests.sorted)
  }

  test("tdigest: centroid count stays O(compression) on big input") {
    val rnd = new scala.util.Random(24)
    val agg = new TDigest.TDigestAgg(Seq(0.5), compression = 100)
    val st0 = Array.fill(200000)(rnd.nextDouble()).foldLeft(TDigest.State.empty)(agg.reduce)
    val st = TDigest.compress(st0, 100)
    assert(st.means.length < 200, s"${st.means.length} centroids for compression=100")
  }

  test("tdigest: dataframe aggregate brackets the exact quantile per group") {
    val rnd = new scala.util.Random(25)
    val rows = for (g <- 0 until 3; _ <- 0 until 8000) yield (g.toLong, rnd.nextDouble() * (g + 1))
    val df = rows.toDF("g", "v").repartition(8)
    val got = df.groupBy("g").agg(TDigest.quantiles(col("v"), Seq(0.5, 0.95)).as("qs"))
      .as[(Long, Seq[Double])].collect().toMap
    for (g <- 0L until 3L) {
      val exact = rows.filter(_._1 == g).map(_._2).sorted
      val p50 = got(g)(0); val p95 = got(g)(1)
      assert(math.abs(rankOf(exact.toArray, p50) - 0.5) < 0.02, s"g=$g p50=$p50")
      assert(math.abs(rankOf(exact.toArray, p95) - 0.95) < 0.02, s"g=$g p95=$p95")
    }
  }
}
