package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit}

/** R107 negative sampling + R108 exact AUC. */
class EvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AUC: perfect, inverted, and random-with-ties ranking") {
    val rows = Seq(
      // group p: positives strictly above negatives -> AUC 1
      ("p", true, 10L), ("p", true, 9L), ("p", false, 5L), ("p", false, 1L),
      // group i: inverted -> AUC 0
      ("i", true, 1L), ("i", false, 5L),
      // group t: ALL scores tied -> AUC exactly 1/2
      ("t", true, 7L), ("t", false, 7L), ("t", true, 7L), ("t", false, 7L))
      .toDF("g", "lbl", "s")
    val got = Eval.aucByGroup(rows, col("g"), col("lbl"), col("s"))
      .select("grp", "n_pos", "n_neg", "u_stat_x2", "auc_ppm")
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("p") == ((2L, 2L, 8L, Some(1000000L))))
    assert(got("i") == ((1L, 1L, 0L, Some(0L))))
    assert(got("t") == ((2L, 2L, 4L, Some(500000L))))
  }

  test("AUC: a group with no negatives reports null, not zero") {
    val rows = Seq(("x", true, 1L), ("x", true, 2L)).toDF("g", "lbl", "s")
    val got = Eval.aucByGroup(rows, col("g"), col("lbl"), col("s"))
      .select("auc_ppm").as[Option[Long]].collect()
    assert(got.toSeq == Seq(None))
  }

  test("AUC: partial tie contributes exactly one half") {
    // pos at 5, neg at 5 and 1: pairs = (5>1)=1 + (5=5)=1/2 -> U*2 = 3
    val rows = Seq(("g", true, 5L), ("g", false, 5L), ("g", false, 1L))
      .toDF("g", "lbl", "s")
    val got = Eval.aucByGroup(rows, col("g"), col("lbl"), col("s"))
      .select("u_stat_x2", "auc_ppm").as[(Long, Long)].head()
    assert(got == ((3L, 750000L)))
  }

  test("calibration: bins partition by normalized score, max lands in last bin") {
    val rows = Seq((true, 100L), (false, 10L), (false, 55L), (true, 100L))
      .toDF("lbl", "s")
    val got = Eval.calibration(rows, col("lbl"), col("s"), bins = 2)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // ppm scores: 1e6, 100000, 550000, 1e6 -> bin0: {100000}, bin1: rest
    assert(got == Seq((0L, 1L, 0L, 0L, 100000L),
      (1L, 3L, 2L, 666666L, 850000L)))
  }

  test("confusion: counts and ppm metrics at a threshold") {
    val rows = Seq((true, 10L), (true, 2L), (false, 10L), (false, 1L),
      (false, 1L)).toDF("lbl", "s")
    val got = Eval.confusionAtThreshold(rows, col("lbl"), col("s"), lit(5L))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    // tp=1 fp=1 tn=2 fn=1: precision 1/2, recall 1/2, f1 = 2/(2+1+1) = 1/2
    assert(got == ((5L, 1L, 1L, 2L, 1L, 500000L, 500000L, 500000L)))
  }

  test("confusion: undefined metrics are null when a class is absent") {
    val rows = Seq((false, 1L), (false, 2L)).toDF("lbl", "s")
    val got = Eval.confusionAtThreshold(rows, col("lbl"), col("s"), lit(10L))
      .select("precision_ppm", "recall_ppm")
      .as[(Option[Long], Option[Long])].head()
    assert(got == ((None, None)))
  }

  test("stratified folds: every stratum balances within one") {
    val rows = ((1L to 10L).map(i => (i, "a")) ++ (11L to 17L).map(i => (i, "b")))
      .toDF("i", "s")
    val got = Eval.stratifiedFolds(rows, col("i"), col("s"), k = 3)
      .as[(Long, String, Long)].collect()
    val sizes = got.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap
    // stratum a: 10 rows over 3 folds -> 4/3/3; b: 7 -> 3/2/2
    assert(sizes.filter(_._1._1 == "a").values.toSeq.sorted == Seq(3, 3, 4))
    assert(sizes.filter(_._1._1 == "b").values.toSeq.sorted == Seq(2, 2, 3))
    val again = Eval.stratifiedFolds(rows, col("i"), col("s"), k = 3)
      .as[(Long, String, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq, "deterministic")
  }

  test("kappa: perfect agreement 1e6; independent marginals near zero") {
    val perfect = Seq((true, true), (false, false), (true, true))
      .toDF("a", "b")
    val k1 = Eval.cohensKappa(perfect, col("a"), col("b"))
      .select("kappa_ppm").as[Option[Long]].head()
    assert(k1 == Some(1000000L))
    // a and b split 50/50 independently over 4 rows, agreement 2/4 = pe
    val indep = Seq((true, true), (true, false), (false, true),
      (false, false)).toDF("a", "b")
    val k2 = Eval.cohensKappa(indep, col("a"), col("b"))
      .select("kappa_ppm").as[Option[Long]].head()
    assert(k2 == Some(0L), "chance-level agreement -> kappa 0")
  }

  test("kappa: degenerate single-class marginals report null") {
    val same = Seq((true, true), (true, true)).toDF("a", "b")
    val k = Eval.cohensKappa(same, col("a"), col("b"))
      .select("kappa_ppm").as[Option[Long]].head()
    assert(k.isEmpty, "p_e = 1 leaves kappa undefined")
  }

  test("time split: exact percentile boundary, embargo band excluded") {
    // ts 1..10, p70 -> cut at ts 7; embargo 2s covers 8..9; test = 10
    val rows = (1L to 10L).map(i => (i, i)).toDF("i", "ts")
    val got = Eval.timeSplitEmbargo(rows, col("i"), col("ts"),
        trainPpm = 700000L, embargoSec = 2L)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert((1L to 7L).forall(got(_) == "train"))
    assert(got(8L) == "embargo" && got(9L) == "embargo")
    assert(got(10L) == "test")
  }

  test("time split: duplicate timestamps stay on one side together") {
    val rows = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 9L)).toDF("i", "ts")
    val got = Eval.timeSplitEmbargo(rows, col("i"), col("ts"),
        trainPpm = 500000L, embargoSec = 0L)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    // cut = first ts whose cumulative reaches 2 of 4 -> ts 5 (cum 3)
    assert(got(1L) == "train" && got(2L) == "train" && got(3L) == "train")
    assert(got(4L) == "test")
  }

  test("point-in-time features: strictly-earlier history only") {
    val rows = Seq((1L, 10L, 100L, 5L), (1L, 11L, 200L, 7L),
      (1L, 12L, 300L, 9L), (2L, 20L, 150L, 4L))
      .toDF("e", "i", "ts", "v")
    val got = Eval.pointInTimeFeatures(rows, col("e"), col("i"),
        col("ts"), col("v"))
      .orderBy("entity", "id")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, 10L, 100L, 0L, 0L, None),       // first: no history, null gap
      (1L, 11L, 200L, 1L, 5L, Some(100L)), // sees ONLY the first row
      (1L, 12L, 300L, 2L, 12L, Some(100L)),
      (2L, 20L, 150L, 0L, 0L, None)))      // entities independent
  }

  test("point-in-time features: same-timestamp rows order by id, not both-ways") {
    // two rows at ts 100: the lower id is 'earlier' — neither sees the
    // other both ways (that would be leakage by tie)
    val rows = Seq((1L, 5L, 100L, 10L), (1L, 6L, 100L, 20L))
      .toDF("e", "i", "ts", "v")
    val got = Eval.pointInTimeFeatures(rows, col("e"), col("i"),
        col("ts"), col("v"))
      .orderBy("id").select("n_prior").as[Long].collect().toSeq
    assert(got == Seq(0L, 1L))
  }

  test("negative sampling: never a positive, deterministic, capped at k") {
    val pos = Seq((1L, 3L), (1L, 7L), (2L, 1L), (2L, 2L), (2L, 3L),
      (2L, 4L), (9L, 10L)).toDF("u", "i")
    val a = Sampling.negativeSample(pos, col("u"), col("i"),
        attempts = 8, k = 3)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val b = Sampling.negativeSample(pos, col("u"), col("i"),
        attempts = 8, k = 3)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(a == b, "two runs draw identical samples")
    val posSet = Seq((1L, 3L), (1L, 7L), (2L, 1L), (2L, 2L), (2L, 3L),
      (2L, 4L), (9L, 10L)).toSet
    assert(a.forall(r => !posSet.contains((r._1, r._2))),
      "no negative is a positive")
    assert(a.groupBy(_._1).values.forall(_.size <= 3), "at most k per user")
    assert(a.forall(r => r._2 >= 1 && r._2 <= 10), "items in [1, max]")
  }

  // ----------------------------------------------------- R150/R151 Brier

  private def runSq(rows: Seq[(String, Boolean, Long)], bins: Int)
      : Map[String, (Long, Long, Long, Long, Long, Long)] =
    Eval.scoreQuality(rows.toDF("g", "y", "p"), col("g"), col("y"),
        col("p"), bins)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7)))
      .toMap

  test("score quality: an oracle scorer lands Brier 0 and ECE 0") {
    val rows = Seq(("g", true, 1000000L), ("g", true, 1000000L),
      ("g", false, 0L), ("g", false, 0L))
    assert(runSq(rows, 10)("g") ==
      ((4L, 2L, 500000L, 500000L, 0L, 0L)))
  }

  test("score quality: matches a BigInt replay on a mixed case") {
    val rows = Seq(("g", true, 800000L), ("g", false, 700000L),
      ("g", true, 300000L), ("g", false, 100000L), ("g", false, 150000L))
    val got = runSq(rows, 4)("g")
    val n = rows.size
    val brier = rows.map { case (_, y, p) =>
      val d = BigInt(p) - (if (y) 1000000 else 0); d * d
    }.sum / n
    val byBin = rows.groupBy { case (_, _, p) => math.min(p * 4 / 1000000, 3) }
    val ece = byBin.values.map { g =>
      (BigInt(g.map(_._3).sum) - BigInt(1000000) * g.count(_._2)).abs
    }.sum / n
    assert(got._5 == brier.toLong)
    assert(got._6 == ece.toLong)
  }

  test("score quality: a constant coin-flip score is calibrated but blunt") {
    // p = 500000 on a 50% base rate: ECE 0 (perfectly calibrated),
    // Brier = 0.25 in ppm² (maximally uninformative)
    val rows = Seq(("g", true, 500000L), ("g", false, 500000L))
    val got = runSq(rows, 10)("g")
    assert(got._6 == 0L)
    assert(got._5 == 250000000000L)
  }

  // ------------------------------------------------------------ R137 NDCG

  private def runNdcg(rows: Seq[(String, Long, Long)], k: Int)
      : Map[String, (Long, Long, Option[Long])] = {
    val df = rows.toDF("q", "rel", "pos")
    Eval.ndcgAtK(df, col("q"), col("rel"), col("pos"), k)
      .as[(String, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  /** Hand DCG from the shared discount table. */
  private def refDcg(rels: Seq[Long]): Long = {
    val disc = Eval.ndcgDiscountsPpm(rels.size)
    rels.zip(disc).map { case (r, d) => r * d }.sum
  }

  test("NDCG: graded list matches the hand-computed discount sum") {
    val rels = Seq(3L, 0L, 2L, 1L, 0L)
    val rows = rels.zipWithIndex.map { case (r, i) => ("q", r, i + 1L) }
    val (dcg, idcg, ndcg) = runNdcg(rows, 5)("q") match {
      case (d, i, n) => (d, i, n)
    }
    assert(dcg == refDcg(rels))
    assert(idcg == refDcg(rels.sorted.reverse))
    assert(ndcg.contains(dcg * 1000000L / idcg))
    assert(ndcg.get < 1000000L, "imperfect ordering scores below 1e6")
  }

  test("NDCG: ideal ordering scores exactly 1e6; all-zero rel is NULL") {
    val ideal = Seq(5L, 4L, 2L, 2L, 0L).zipWithIndex
      .map { case (r, i) => ("a", r, i + 1L) }
    val zero = (1L to 5L).map(i => ("z", 0L, i))
    val got = runNdcg(ideal ++ zero, 5)
    assert(got("a")._3.contains(1000000L))
    assert(got("z") == ((0L, 0L, None)))
  }

  test("NDCG: positions beyond k are ignored") {
    val rows = Seq(("q", 2L, 1L), ("q", 1L, 2L), ("q", 9L, 3L))
    val got = runNdcg(rows, 2)("q")
    assert(got._1 == refDcg(Seq(2L, 1L)))
    assert(got._3.contains(1000000L), "within k the ordering is ideal")
  }
}
