package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from the
  * higher-order builtins (`zip_with`, `aggregate`, `transform`) so the hot
  * loops are codegen'd — no UDF boxing on a 100 TB embedding scan.
  *
  * All accumulation is in double precision, left-to-right in index order
  * (deterministic for a given array).
  */
object VectorFunctions {
  /** Sum of elements of a double array. */
  private def dsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float vectors (double accumulation). Backed by the
    * codegen'd native expression; arithmetic identical to the builtin form
    * dsum(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double))).
    */
  def dot(a: Column, b: Column): Column = NativeExpressions.vec_dot(a, b)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(dsum(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared euclidean distance. */
  def l2sq(a: Column, b: Column): Column =
    dsum(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }))
}
