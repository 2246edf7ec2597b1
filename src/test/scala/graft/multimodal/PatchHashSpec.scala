package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PatchHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hash(bytes: Array[Byte]): Option[Long] = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(PatchHash.ahash(col("p")).as("h"))
      .as[Option[Long]].collect()
    r.head
  }

  test("hand-computed hash: bits set exactly where pixel > floor(mean)") {
    // 32 zeros then 32 times 100 → sum 3200, mean 50: bits 32..63 set
    val b = (Array.fill(32)(0) ++ Array.fill(32)(100)).map(_.toByte)
    val expect = (32 until 64).foldLeft(0L)((h, i) => h | (1L << i))
    assert(hash(b).contains(expect))
    // strict >: a constant patch has NO bits set (px == mean everywhere)
    assert(hash(Array.fill(64)(7.toByte)).contains(0L))
  }

  test("bit 63 rides the sign bit (negative longs are fine)") {
    // only the last pixel above the mean → exactly bit 63 → Long.MinValue
    val b = (Array.fill(63)(0) ++ Array(255)).map(_.toByte)
    // sum 255, mean 3: pixel 63 (255) > 3 — only bit 63
    assert(hash(b).contains(Long.MinValue))
  }

  test("high pixel values are unsigned (0xFF = 255, not -1)") {
    val b = Array.fill(64)(0xff.toByte)
    // constant patch → no bits (mean 255, strict >)
    assert(hash(b).contains(0L))
  }

  test("wrong-size patches hash to null") {
    assert(hash(Array.fill(63)(1.toByte)).isEmpty)
    assert(hash(Array.fill(65)(1.toByte)).isEmpty)
    assert(hash(Array.empty[Byte]).isEmpty)
  }

  test("mean-preserving pixel swap moves Hamming by at most 2") {
    val base = (0 until 64).map(i => ((i * 37) % 256).toByte).toArray
    val swapped = base.clone()
    val t = swapped(0); swapped(0) = swapped(1); swapped(1) = t
    val d = java.lang.Long.bitCount(hash(base).get ^ hash(swapped).get)
    assert(d <= 2)
  }

  test("codegen and interpreted eval agree") {
    val b = (0 until 64).map(i => ((i * 11 + 3) % 256).toByte).toArray
    val viaExpr = hash(b).get
    val viaEval = PatchHash.ahashBoxed(b).longValue()
    assert(viaExpr == viaEval)
  }
}
