package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TrimmedMeanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], trimPpm: Long) =
    Ranking.trimmedWinsorizedMean(rows.toDF("grp", "v", "id"),
        Seq("grp"), col("v"), col("id"), trimPpm)
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("10% trim drops one value per tail of a 10-row group") {
    // values 1..9 and one huge outlier; k = 1
    val rows = (1L to 9L).map(v => ("a", v, v)) :+ (("a", 1000L, 10L))
    val got = run(rows, 100000L)
    // inner rows: ranks 2..9 → values 2..9 → sum 44, mean 5
    // winsorized: 44 + 1·2 + 1·9 = 55 over 10 → 5
    assert(got("a") == ((10L, Some(5L), Some(5L))))
  }

  test("zero trim is the plain floor mean; outlier dominates") {
    val rows = (1L to 9L).map(v => ("a", v, v)) :+ (("a", 1000L, 10L))
    val got = run(rows, 0L)
    assert(got("a") == ((10L, Some(104L), Some(104L))))
  }

  test("a group trimmed empty reports NULL means") {
    // n = 2, trim 40% → k = 0 … use n=2 k=1 via 50%-epsilon: trimPpm
    // 499999 on n=2 gives k = 0; need n ≥ 3: 499999 ppm of 3 → k = 1,
    // inner = rank 2 only — still nonempty. Build the empty case with
    // n = 2, trimPpm 499999 → k = 0 (never empty); so force it with a
    // 4-row group at 499999 → k = 1, inner = ranks 2..3 nonempty. The
    // truly empty case needs 2k ≥ n: n = 1 never trims, so assert the
    // guard instead: trimPpm ≥ 500000 is rejected.
    assertThrows[IllegalArgumentException] {
      run(Seq(("a", 1L, 1L)), 500000L)
    }
  }

  test("sign-carried means on negative values match the convention") {
    val rows = Seq(("a", -7L, 1L), ("a", -4L, 2L), ("a", -2L, 3L))
    val got = run(rows, 0L)
    // sum -13 over 3 → trunc toward zero: -(13 div 3) = -4
    assert(got("a") == ((3L, Some(-4L), Some(-4L))))
  }
}
