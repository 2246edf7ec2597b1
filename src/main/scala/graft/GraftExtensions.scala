package graft

import graft.functions.{CharShinglesExpr, Md5Prefix24, RollingHash, SortedIntersectCount,
  VecDot, WordShinglesExpr}
import graft.multimodal.{AudioMetaExpr, ContentTypeExpr, ImageMetaExpr, VideoMetaExpr}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions exposing graft's native expressions to SQL users:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)  // code
  *   --conf spark.sql.extensions=graft.GraftExtensions           // deploy
  *
  * after which `SELECT rolling_hash(text), vec_dot(a, b) ...` plans with
  * full whole-stage codegen like any builtin.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("image_meta"),
      new ExpressionInfo(classOf[ImageMetaExpr].getName, "image_meta"),
      (exprs: Seq[Expression]) => ImageMetaExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("audio_meta"),
      new ExpressionInfo(classOf[AudioMetaExpr].getName, "audio_meta"),
      (exprs: Seq[Expression]) => AudioMetaExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("video_meta"),
      new ExpressionInfo(classOf[VideoMetaExpr].getName, "video_meta"),
      (exprs: Seq[Expression]) => VideoMetaExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("content_type"),
      new ExpressionInfo(classOf[ContentTypeExpr].getName, "content_type"),
      (exprs: Seq[Expression]) => ContentTypeExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("md5_prefix24"),
      new ExpressionInfo(classOf[Md5Prefix24].getName, "md5_prefix24"),
      (exprs: Seq[Expression]) => Md5Prefix24(exprs.head)))
    def litInt(ex: Expression, fn: String): Int = ex match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn: shingle size must be an integer literal, got $other")
    }
    e.injectFunction((
      FunctionIdentifier("char_shingles"),
      new ExpressionInfo(classOf[CharShinglesExpr].getName, "char_shingles"),
      (exprs: Seq[Expression]) =>
        CharShinglesExpr(exprs(0), litInt(exprs(1), "char_shingles"))))
    e.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShinglesExpr].getName, "word_shingles"),
      (exprs: Seq[Expression]) =>
        WordShinglesExpr(exprs(0), litInt(exprs(1), "word_shingles"))))
    e.injectFunction((
      FunctionIdentifier("zvalue"),
      new ExpressionInfo(classOf[graft.layout.ZValueN].getName, "zvalue"),
      (exprs: Seq[Expression]) =>
        graft.layout.ZValueN(exprs.init, litInt(exprs.last, "zvalue"))))
  }
}
