package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RankStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // ------------------------------------------------------------ R120 U

  private def runU(rows: Seq[(String, Boolean, Long)])
      : Map[String, (Long, Long, Long, Long, Option[Long])] = {
    val df = rows.toDF("g", "s", "v")
    RankStats.mannWhitneyU(df, col("g"), col("s"), col("v"))
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
  }

  /** Brute-force doubled-U via doubled midranks. */
  private def refU(rows: Seq[(Boolean, Long)]): (Long, Long) = {
    val sorted = rows.map(_._2).sorted
    def rank2(v: Long): Long = {
      val rmin = sorted.indexOf(v) + 1L
      val cnt = sorted.count(_ == v).toLong
      2 * rmin + cnt - 1
    }
    val na = rows.count(_._1).toLong
    val r2a = rows.filter(_._1).map(r => rank2(r._2)).sum
    val u2a = r2a - na * (na + 1)
    (na, u2a)
  }

  test("U matches brute-force midranks under heavy ties") {
    val rows = Seq(
      ("g", true, 3L), ("g", true, 5L), ("g", true, 5L), ("g", true, 9L),
      ("g", false, 1L), ("g", false, 5L), ("g", false, 5L), ("g", false, 7L),
      ("g", false, 9L))
    val (na, u2a) = refU(rows.map(r => (r._2, r._3)))
    val got = runU(rows)("g")
    assert((got._1, got._3) == ((na, u2a)))
    assert(got._3 + got._4 == 2 * got._1 * got._2) // u2_a + u2_b = 2*na*nb
  }

  test("complete separation lands AUC at 0 and 1000000") {
    val hi = (1L to 5L).map(v => ("g", true, v + 100L))
    val lo = (1L to 4L).map(v => ("g", false, v))
    val got = runU(hi ++ lo)("g")
    assert(got._5.contains(1000000L))
    val flipped = runU((hi ++ lo).map(r => (r._1, !r._2, r._3)))("g")
    assert(flipped._5.contains(0L))
  }

  test("identical distributions land AUC at exactly 500000") {
    val rows = (1L to 6L).flatMap(v => Seq(("g", true, v), ("g", false, v)))
    assert(runU(rows)("g")._5.contains(500000L))
  }

  test("an empty side yields NULL AUC, zero U") {
    val got = runU(Seq(("g", false, 1L), ("g", false, 2L)))("g")
    assert(got == ((0L, 2L, 0L, 0L, None)))
  }

  // ------------------------------------------------------------ R121 Gini

  private def runGini(rows: Seq[(String, Long, Long)]): Map[String, Long] = {
    val df = rows.toDF("g", "x", "id")
    RankStats.giniCoefficient(df, "g", col("x"), col("id"))
      .select(col("grp"), col("gini_ppm"))
      .as[(String, Long)].collect().toMap
  }

  test("perfect equality scores 0, single-holder scores (n-1)/n") {
    val eq = (1L to 5L).map(i => ("e", 10L, i))
    val mono = ("m", 100L, 1L) +: (2L to 5L).map(i => ("m", 0L, i))
    val got = runGini(eq ++ mono)
    assert(got("e") == 0L)
    assert(got("m") == 800000L) // (5-1)/5
  }

  test("hand example: x = 1,2,3,4 ascending") {
    // sum ix = 1+4+9+16 = 30; (2*30 - 5*10)*1e6 / (4*10) = 250000
    assert(runGini((1L to 4L).map(i => ("g", i, i)))("g") == 250000L)
  }

  // ------------------------------------------------------------ R122 TV

  private def runTv(rows: Seq[(String, String, Boolean)])
      : Map[String, (Long, Long, Long, Option[Long])] = {
    val df = rows.toDF("g", "c", "s")
    RankStats.totalVariation(df, col("g"), col("c"), col("s"))
      .as[(String, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("identical mixes score 0, disjoint supports score 1000000") {
    val same = Seq(("i", "x", true), ("i", "y", true),
      ("i", "x", false), ("i", "y", false))
    val disj = Seq(("d", "x", true), ("d", "y", false))
    val got = runTv(same ++ disj)
    assert(got("i")._4.contains(0L))
    assert(got("d")._4.contains(1000000L))
  }

  test("hand example: P=(1/2,1/2), Q=(3/4,1/4) -> TV = 1/4") {
    val rows = Seq(("g", "x", true), ("g", "y", true),
      ("g", "x", false), ("g", "x", false), ("g", "x", false),
      ("g", "y", false))
    assert(runTv(rows)("g") == ((2L, 4L, 2L, Some(250000L))))
  }

  test("an empty side yields NULL") {
    assert(runTv(Seq(("g", "x", true)))("g")._4.isEmpty)
  }

  // ------------------------------------------------------------ R123 rho

  private def runRho(rows: Seq[(String, Long, Long, Long)])
      : Map[String, (Long, Long, Option[Long])] = {
    val df = rows.toDF("g", "x", "y", "id")
    RankStats.spearman(df, "g", col("x"), col("y"), col("id"))
      .as[(String, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("perfect monotone is 1000000, perfect inverse is -1000000") {
    val up = (1L to 6L).map(i => ("u", i, i * 10, i))
    val down = (1L to 6L).map(i => ("d", i, -i * 10, i))
    val got = runRho(up ++ down)
    assert(got("u") == ((6L, 0L, Some(1000000L))))
    assert(got("d")._3.contains(-1000000L))
  }

  test("hand example with one swap") {
    // x ranks 1..4; y ranks 1,2,4,3 -> d2 = 0+0+1+1 = 2
    // rho = 1e6 - 6*2*1e6/(4*15) = 1e6 - 200000 = 800000
    val rows = Seq(("g", 1L, 10L, 1L), ("g", 2L, 20L, 2L),
      ("g", 3L, 40L, 3L), ("g", 4L, 30L, 4L))
    assert(runRho(rows)("g") == ((4L, 2L, Some(800000L))))
  }

  test("ties resolve by id so equal values still rank deterministically") {
    // x all equal: rank_x = id order; y = id order too -> d2 = 0
    val rows = (1L to 4L).map(i => ("g", 7L, i, i))
    assert(runRho(rows)("g") == ((4L, 0L, Some(1000000L))))
  }

  test("singleton group has no correlation (NULL)") {
    assert(runRho(Seq(("g", 1L, 1L, 1L)))("g")._3.isEmpty)
  }

  // ------------------------------------------------------------ R125 KS

  private def runKs(rows: Seq[(String, Boolean, Long)])
      : Map[String, (Long, Long, Option[Long], Option[Long])] = {
    val df = rows.toDF("g", "s", "v")
    RankStats.ksDistance(df, col("g"), col("s"), col("v"))
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("KS: identical samples score 0, disjoint samples score 1000000") {
    val same = (1L to 4L).flatMap(v => Seq(("i", true, v), ("i", false, v)))
    val disj = Seq(("d", true, 1L), ("d", true, 2L),
      ("d", false, 10L), ("d", false, 11L))
    val got = runKs(same ++ disj)
    assert(got("i")._3.contains(0L))
    assert(got("d") == ((2L, 2L, Some(1000000L), Some(2L))))
  }

  test("KS: hand case — gap opens at the reported location") {
    // A = {1,2,3}, B = {2,3,4}: F_a-F_b gaps (x3x3): v1 |1*3-0|=3,
    // v2 |2*3-1*3|=3, v3 |9-6|=3, v4 0 -> max 3, first at v=1; ks=3/9
    val rows = Seq(("g", true, 1L), ("g", true, 2L), ("g", true, 3L),
      ("g", false, 2L), ("g", false, 3L), ("g", false, 4L))
    assert(runKs(rows)("g") == ((3L, 3L, Some(333333L), Some(1L))))
  }

  test("KS: empty side reports NULL") {
    val got = runKs(Seq(("g", false, 1L), ("g", false, 5L)))("g")
    assert(got._3.isEmpty && got._4.isEmpty)
  }

  // ------------------------------------------------------------ R127 W1

  private def runW1(rows: Seq[(String, Boolean, Long)])
      : Map[String, Option[Long]] = {
    val df = rows.toDF("g", "s", "v")
    RankStats.wasserstein1(df, col("g"), col("s"), col("v"))
      .select(col("grp"), col("w1_milli"))
      .as[(String, Option[Long])].collect().toMap
  }

  test("W1: point masses at distance d cost exactly d") {
    assert(runW1(Seq(("g", true, 0L), ("g", false, 7L)))("g")
      .contains(7000L))
  }

  test("W1: identical samples cost 0; a uniform shift by 1 costs 1") {
    val same = (1L to 5L).flatMap(v => Seq(("i", true, v), ("i", false, v)))
    val shift = (1L to 5L).flatMap(v =>
      Seq(("s", true, v), ("s", false, v + 1)))
    val got = runW1(same ++ shift)
    assert(got("i").contains(0L))
    assert(got("s").contains(1000L))
  }

  test("W1: empty side reports NULL") {
    assert(runW1(Seq(("g", true, 3L)))("g").isEmpty)
  }

  // ------------------------------------------------------------ R126 V²

  private def runV2(rows: Seq[(String, String, String)])
      : Map[String, (Long, Long, Long, Long, Option[Long])] = {
    val df = rows.toDF("g", "a", "b")
    RankStats.cramersV(df, col("g"), col("a"), col("b"))
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
  }

  test("V2: perfect 2x2 association scores 1000000, independence 0") {
    val assoc = Seq.fill(3)(("p", "x", "u")) ++ Seq.fill(3)(("p", "y", "w"))
    val indep = for (a <- Seq("x", "y"); b <- Seq("u", "w"))
      yield ("i", a, b)
    val got = runV2(assoc ++ indep)
    assert(got("p")._5.contains(1000000L))
    assert(got("p")._4 == 6000L) // chi2_milli = 1000*n for perfect 2x2
    assert(got("i")._5.contains(0L))
  }

  test("V2: zero cells contribute their expectation (full margin grid)") {
    // 2x2 with an empty diagonal cell: o=(2,0 / 1,1), margins r=(2,2),
    // c=(3,1), n=4. terms*1000 with per-cell floor:
    //  (2*4-2*3)^2*1000/(4*6)=166, (0*4-2*1)^2*1000/(4*2)=500,
    //  (1*4-2*3)^2*1000/(4*6)=166, (1*4-2*1)^2*1000/(4*2)=500 -> 1332;
    //  v2 = 1332*1000/(4*1) = 333000 (true chi2/n = 1.333/4 = 0.333)
    val rows = Seq(("g", "x", "u"), ("g", "x", "u"), ("g", "y", "u"),
      ("g", "y", "w"))
    val got = runV2(rows)("g")
    assert(got == ((4L, 2L, 2L, 1332L, Some(333000L))))
  }

  test("V2: a single-valued margin yields NULL (no degrees of freedom)") {
    assert(runV2(Seq(("g", "x", "u"), ("g", "x", "w")))("g")._5.isEmpty)
  }

  // ------------------------------------------------------------ R129 Qs

  private def runQs(rows: Seq[(String, Boolean, Long)], ps: Seq[Long])
      : Map[(String, Long), (Option[Long], Option[Long], Option[Long])] = {
    val df = rows.toDF("g", "s", "v")
    RankStats.quantileShift(df, col("g"), col("s"), col("v"), ps)
      .select(col("grp"), col("p_ppm"), col("v_a"), col("v_b"), col("shift"))
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
  }

  test("quantile shift: type-1 quantiles land on exact ranks") {
    // A = 1..10, B = 11..20: median of A = ceil(0.5*10)=rank 5 -> 5
    val rows = (1L to 10L).map(v => ("g", true, v)) ++
      (11L to 20L).map(v => ("g", false, v))
    val got = runQs(rows, Seq(500000L, 900000L, 1000000L))
    assert(got(("g", 500000L)) == ((Some(5L), Some(15L), Some(-10L))))
    assert(got(("g", 900000L)) == ((Some(9L), Some(19L), Some(-10L))))
    assert(got(("g", 1000000L)) == ((Some(10L), Some(20L), Some(-10L))))
  }

  test("quantile shift: p below one sample point returns the minimum") {
    val rows = Seq(("g", true, 7L), ("g", false, 3L))
    assert(runQs(rows, Seq(1L)) ==
      Map(("g", 1L) -> ((Some(7L), Some(3L), Some(4L)))))
  }

  test("quantile shift: empty side reports NULL quantile and shift") {
    val rows = Seq(("g", false, 1L), ("g", false, 2L))
    val got = runQs(rows, Seq(500000L))(("g", 500000L))
    assert(got == ((None, Some(1L), None)))
  }

  // ------------------------------------------------------------ R131 ACF

  private def runAcf(rows: Seq[(String, Long, Long, Long)], lags: Seq[Int])
      : Map[(String, Long), Option[Long]] = {
    val df = rows.toDF("g", "ts", "id", "x")
    RankStats.autocorrelation(df, "g", col("ts"), col("id"), col("x"), lags)
      .select(col("grp"), col("lag"), col("acf_ppm"))
      .as[(String, Long, Option[Long])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
  }

  /** Brute-force reference with the same sign-safe magnitude floor. */
  private def refAcf(xs: Seq[Long], lag: Int): Option[Long] = {
    val n = xs.size.toLong
    val s = xs.sum
    val c = xs.map(x => BigInt(n) * x - s)
    val den = c.map(d => d * d).sum
    if (den == 0 || n <= lag) None
    else {
      val num = (lag until xs.size).map(t => c(t) * c(t - lag)).sum
      val m = num.abs * 1000000 / den
      Some(if (num < 0) -m.toLong else m.toLong)
    }
  }

  test("acf matches brute force, positive and negative regimes") {
    val trend = (1L to 12L).map(v => v * 10)        // strong positive acf
    val alt = (1L to 12L).map(v => if (v % 2 == 0) 100L else -100L) // negative
    val rows = trend.zipWithIndex.map { case (v, i) => ("t", i.toLong, i.toLong, v) } ++
      alt.zipWithIndex.map { case (v, i) => ("a", i.toLong, i.toLong, v) }
    val got = runAcf(rows, Seq(1, 2))
    assert(got(("t", 1L)) == refAcf(trend, 1))
    assert(got(("t", 2L)) == refAcf(trend, 2))
    assert(got(("a", 1L)) == refAcf(alt, 1))
    assert(got(("a", 2L)) == refAcf(alt, 2))
    assert(got(("a", 1L)).get < 0L && got(("t", 1L)).get > 0L)
  }

  test("acf: constant series and too-short series report NULL") {
    val const = (1L to 5L).map(i => ("c", i, i, 7L))
    val short = Seq(("s", 1L, 1L, 3L), ("s", 2L, 2L, 9L))
    val got = runAcf(const ++ short, Seq(3))
    assert(got(("c", 3L)).isEmpty)
    assert(got(("s", 3L)).isEmpty)
  }

  test("acf: alternating series at even lag is positive, odd lag negative") {
    val alt = (1L to 10L).map(v => if (v % 2 == 0) 50L else -50L)
    val rows = alt.zipWithIndex.map { case (v, i) => ("g", i.toLong, i.toLong, v) }
    val got = runAcf(rows, Seq(1, 2))
    assert(got(("g", 1L)).get < 0 && got(("g", 2L)).get > 0)
    assert(got(("g", 2L)) == refAcf(alt, 2))
  }

  // ------------------------------------------------------------ R128 ABC

  private def runAbc(rows: Seq[(String, Long, Long)], buckets: Int = 4096)
      : Map[(String, String), (Long, Long, Long)] = {
    val df = rows.toDF("g", "x", "id")
    RankStats.abcClassify(df, "g", col("x"), col("id"), buckets = buckets)
      .as[(String, String, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
  }

  test("ABC: the boundary-crossing entity belongs to the class it entered") {
    // 70/20/10: cum-before = 0, 70, 90 -> A, B, C exactly
    val rows = Seq(("g", 70L, 1L), ("g", 20L, 2L), ("g", 10L, 3L))
    val got = runAbc(rows)
    assert(got(("g", "A")) == ((1L, 70L, 700000L)))
    assert(got(("g", "B")) == ((1L, 20L, 200000L)))
    assert(got(("g", "C")) == ((1L, 10L, 100000L)))
  }

  test("ABC: equal masses split 3/1 at the 70% boundary") {
    // 4 x 25: cum-before 0,25,50 < 70 -> A; 75 -> B; C empty
    val rows = (1L to 4L).map(i => ("g", 25L, i))
    val got = runAbc(rows)
    assert(got(("g", "A")) == ((3L, 75L, 750000L)))
    assert(got(("g", "B")) == ((1L, 25L, 250000L)))
    assert(!got.contains(("g", "C")))
  }

  test("ABC: bucket count does not change the classification") {
    val rows = (1L to 50L).map(i => ("g", (i * 37) % 101 + 1, i))
    assert(runAbc(rows, 1) == runAbc(rows, 4096))
    assert(runAbc(rows, 3) == runAbc(rows, 4096))
  }

  test("ABC: ties in mass resolve by id so classes are deterministic") {
    // total 105, A-boundary at 73.5: head 65 -> A; the two equal 20s
    // straddle it — id 2 enters at 65 (A), id 3 at 85 (B)
    val rows = Seq(("g", 65L, 1L), ("g", 20L, 2L), ("g", 20L, 3L))
    val got = runAbc(rows)
    assert(got(("g", "A")) == ((2L, 85L, 809523L)))
    assert(got(("g", "B")) == ((1L, 20L, 190476L)))
    assert(!got.contains(("g", "C")))
  }

  // ------------------------------------------------------------ R138 tau

  private def runTau(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Long, Long, Long, Long, Option[Long], Option[Long])] = {
    val df = rows.toDF("g", "x", "y")
    RankStats.kendallTau(df, "g", col("x"), col("y"))
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8))).toMap
  }

  /** Brute-force pair walk: (nc, nd, tx, ty). */
  private def refTau(rows: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.size) {
      val sx = java.lang.Long.compare(rows(i)._1, rows(j)._1)
      val sy = java.lang.Long.compare(rows(i)._2, rows(j)._2)
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
      if (sx != 0 && sy != 0) { if (sx == sy) nc += 1 else nd += 1 }
    }
    (nc, nd, tx, ty)
  }

  test("tau: grid counts match the brute-force pair walk under ties") {
    val rows = Seq((1L, 2L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 3L),
      (3L, 1L), (4L, 4L), (4L, 2L), (5L, 5L))
    val (nc, nd, tx, ty) = refTau(rows)
    val got = runTau(rows.map(r => ("g", r._1, r._2)))("g")
    assert((got._2, got._3, got._4, got._5) == ((nc, nd, tx, ty)))
    val n = rows.size.toLong
    val n0 = n * (n - 1) / 2
    val tauA = math.abs(nc - nd) * 1000000L / n0
    assert(got._6.contains(if (nc >= nd) tauA else -tauA))
    val tauB2 = (nc - nd) * (nc - nd) * 1000000L / ((n0 - tx) * (n0 - ty))
    assert(got._7.contains(if (nc >= nd) tauB2 else -tauB2))
  }

  test("tau: perfect concordance and perfect discordance") {
    val up = (1L to 5L).map(v => ("u", v, v * 10))
    val down = (1L to 5L).map(v => ("d", v, 100 - v))
    val got = runTau(up ++ down)
    assert(got("u")._6.contains(1000000L))
    assert(got("u")._7.contains(1000000L))
    assert(got("d")._6.contains(-1000000L))
    assert(got("d")._7.contains(-1000000L))
  }

  test("tau: single row and fully-tied margin degenerate to NULL") {
    val got = runTau(Seq(("one", 7L, 7L),
      ("tied", 5L, 1L), ("tied", 5L, 2L), ("tied", 5L, 3L)))
    assert(got("one")._6.isEmpty && got("one")._7.isEmpty)
    // all x tied: tau-a is 0 div n0 = 0, tau-b undefined
    assert(got("tied")._6.contains(0L))
    assert(got("tied")._7.isEmpty)
  }

  // ---------------------------------------------------- R155 permutation

  /** Driver-side hash48 (first 12 md5 hex chars). */
  private def h48(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  private def runPerm(rows: Seq[(String, Boolean, Long, Long)], b: Int)
      : Map[String, (Long, Long, Option[Long], Long, Long)] =
    RankStats.permutationTest(rows.toDF("g", "s", "v", "id"), "g",
        col("s"), col("v"), col("id"), b)
      .as[(String, Long, Long, Option[Long], Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("permutation: exact replay of the hash-shuffled labelings") {
    val rows = Seq(("g", true, 100L, 1L), ("g", true, 90L, 2L),
      ("g", false, 10L, 3L), ("g", false, 20L, 4L))
    val got = runPerm(rows, 8)
    val (na, nb) = (2L, 2L)
    val (sa, sb) = (190L, 30L)
    val dobs = math.abs(sa * nb - sb * na)
    val vById = rows.map(r => r._4 -> r._3).toMap
    val nExtreme = (1 to 8).count { b =>
      val order = rows.map(_._4).sortBy(id => (h48(s"g:$b:$id"), id))
      val saB = order.take(na.toInt).map(vById).sum
      val sbB = 220L - saB
      math.abs(saB * nb - sbB * na) >= dobs
    }.toLong
    assert(got("g") == ((na, nb, Some((sa * nb - sb * na) * 1000 / (na * nb)),
      nExtreme, (1 + nExtreme) * 1000000L / 9)))
  }

  test("permutation: a flat outcome is never significant") {
    val rows = (1L to 12L).map(i => ("f", i % 2 == 0, 5L, i))
    val got = runPerm(rows, 10)("f")
    assert(got._4 == 10L, "every shuffle is exactly as extreme")
    assert(got._5 == 1000000L, "p = 1")
  }

  test("permutation: clear separation drives p to the floor") {
    val rows = (1L to 8L).map(i => ("s", i <= 4, if (i <= 4) 1000L else 1L, i))
    val got = runPerm(rows, 20)
    assert(got("s")._5 <= 3 * 1000000L / 21,
      s"p should be near 1/(B+1), got ${got("s")._5}")
  }

  // ----------------------------------------------------------- R141 Welch

  private def runWelch(rows: Seq[(String, Boolean, Long)])
      : Map[String, (Long, Long, Long, Long, Option[Long], Option[Long])] = {
    val df = rows.toDF("g", "s", "v")
    RankStats.welchT2(df, col("g"), col("s"), col("v"))
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
  }

  /** Exact BigInt replay of the rational identity. */
  private def refWelch(a: Seq[Long], b: Seq[Long])
      : (Option[Long], Option[Long]) = {
    val (na, nb) = (BigInt(a.size), BigInt(b.size))
    val (sa, sb) = (BigInt(a.sum), BigInt(b.sum))
    val qa = a.map(v => BigInt(v) * v).sum
    val qb = b.map(v => BigInt(v) * v).sum
    val d = sa * nb - sb * na
    val md = if (na == 0 || nb == 0) None
      else Some((d.abs * 1000 / (na * nb) * (if (d < 0) -1 else 1)).toLong)
    val den = (na * qa - sa * sa) * nb * nb * (nb - 1) +
      (nb * qb - sb * sb) * na * na * (na - 1)
    val t2 = if (na < 2 || nb < 2 || den <= 0) None
      else Some((d * d * (na - 1) * (nb - 1) * 1000 / den).toLong)
    (md, t2)
  }

  test("welch: matches the exact rational identity AND the float t²") {
    val a = Seq(12L, 15L, 11L, 18L, 14L)
    val b = Seq(9L, 10L, 8L, 12L)
    val got = runWelch(a.map(("g", true, _)) ++ b.map(("g", false, _)))("g")
    assert((got._5, got._6) == refWelch(a, b))
    // float cross-check: t = (m1-m2)/sqrt(v1/n1+v2/n2)
    def mv(xs: Seq[Long]) = {
      val m = xs.sum.toDouble / xs.size
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1.0))
    }
    val ((m1, v1), (m2, v2)) = (mv(a), mv(b))
    val t2f = (m1 - m2) * (m1 - m2) / (v1 / a.size + v2 / b.size)
    assert(math.abs(got._6.get - t2f * 1000).toDouble <= 1.0,
      s"milli t² ${got._6.get} vs float ${t2f * 1000}")
  }

  test("welch: identical sides land at 0; sign follows the mean order") {
    val same = (1L to 5L).flatMap(v => Seq(("eq", true, v), ("eq", false, v)))
    val gotEq = runWelch(same)("eq")
    assert(gotEq._5.contains(0L) && gotEq._6.contains(0L))
    val lower = runWelch(
      Seq(1L, 2L, 3L).map(("lo", true, _)) ++
        Seq(10L, 11L, 12L).map(("lo", false, _)))("lo")
    assert(lower._5.exists(_ < 0L), "A below B means a negative mean diff")
  }

  test("welch: constant sides and missing sides degenerate to NULL") {
    val const = Seq(("c", true, 5L), ("c", true, 5L),
      ("c", false, 7L), ("c", false, 7L))
    val gotC = runWelch(const)("c")
    assert(gotC._6.isEmpty, "zero variance has no t²")
    assert(gotC._5.contains(-2000L), "mean diff stays exact")
    val gotM = runWelch(Seq(("m", true, 5L), ("m", true, 6L)))("m")
    assert(gotM._5.isEmpty && gotM._6.isEmpty)
    assert((gotM._1, gotM._2) == ((2L, 0L)))
  }
}
