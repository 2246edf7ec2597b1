package graft.similarity

import graft.PlanProbe.CkptOps
import graft.functions.VectorFunctions.l2sq
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization: the compressed-domain ANN path for when even IVF
  * lists are too large to scan uncompressed.
  *
  * The 64-dim float vector (256 B) becomes `m` one-byte codes (here 4 B —
  * 64×, the difference between a corpus that fits in cluster memory and
  * one that doesn't): each of the m sub-vectors is replaced by the id of
  * its nearest sub-codebook centroid. Search is asymmetric distance
  * computation (ADC): per query, an m×k table of exact sub-distances to
  * every centroid (tiny, broadcast), then a candidate's approximate
  * distance is m table lookups + a sum — no float math against the corpus
  * at all. The codes table join is the only corpus-sized operation, and it
  * carries 4-byte payloads.
  *
  * All shapes are declarative: sub-vector slices are narrow projections,
  * codebooks broadcast, the argmin is a window rank, the ADC sum one hash
  * aggregate keyed (query, cand).
  */
object Pq {
  /** Deterministic untrained codebooks — sub-vectors of evenly-strided
    * corpus rows. The oracle-checkable baseline (training-free), same
    * spirit as the IVF gate's strided centroids; [[trainCodebooks]] is the
    * quality path.
    * @return (sub, code, cb) — cb an array<float> of length subDim
    */
  def strideCodebooks(corpus: DataFrame, m: Int, k: Int, subDim: Int,
                      stride: Long): DataFrame = {
    val base = corpus
      .filter(col("cand_id") % stride === 0 && col("cand_id") < stride * k)
      .select((col("cand_id") / stride).cast("long").as("code"), col("embedding"))
    (0 until m).map { s =>
      base.select(lit(s).as("sub"), col("code"),
        slice(col("embedding"), s * subDim + 1, subDim).as("cb"))
    }.reduce(_ unionByName _)
  }

  /** Lloyd-trained sub-codebooks: per sub-space, k-means over the corpus
    * sub-vectors (L2). Same declarative iteration as [[Ann.trainCentroids]]
    * but per sub-space and with euclidean assignment (PQ's objective).
    */
  def trainCodebooks(corpus: DataFrame, m: Int, k: Int, subDim: Int,
                     iterations: Int): DataFrame = {
    val stride = {
      val n = corpus.count()
      math.max(1L, n / k)
    }
    var codebooks = strideCodebooks(corpus, m, k, subDim, stride)
    for (_ <- 1 to iterations) {
      val subs = subVectors(corpus, "cand_id", m, subDim)
      val assigned = nearestCode(subs, codebooks)
      val means = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(avg(col("x").cast("double")).as("mx"))
        .groupBy(col("sub"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pairs"))
        .select(col("sub"), col("code"),
          transform(col("pairs"), p => p.getField("mx").cast("float")).as("cb"))
      codebooks = means.ckpt
    }
    codebooks
  }

  /** (id, sub, sv): every row exploded into its m sub-vectors (narrow). */
  private def subVectors(df: DataFrame, idCol: String, m: Int, subDim: Int): DataFrame =
    (0 until m).map { s =>
      df.select(col(idCol), lit(s).as("sub"),
        slice(col("embedding"), s * subDim + 1, subDim).as("sv"))
    }.reduce(_ unionByName _)

  /** Nearest codebook entry per (row, sub): exact L2 against the broadcast
    * codebook, deterministic tie-break on code.
    */
  private def nearestCode(subs: DataFrame, codebooks: DataFrame): DataFrame = {
    val scored = subs.join(broadcast(codebooks), Seq("sub"))
      .withColumn("dist", l2sq(col("sv"), col("cb")))
    val w = Window.partitionBy(subs.columns.head, "sub")
      .orderBy(col("dist"), col("code"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn", "cb", "dist")
  }

  /** Encode the corpus: (cand_id, sub, code) — m small integers per row. */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int, subDim: Int): DataFrame =
    nearestCode(subVectors(corpus, "cand_id", m, subDim), codebooks)
      .select(col("cand_id"), col("sub"), col("code"))

  /** ADC top-k: per query, a sub-distance table to every codebook entry
    * (m×k rows, broadcast), then approximate distance = Σ_sub
    * table[sub][code]. Table entries are quantized to fixed point
    * (floor(d·2²⁰)) — what production PQ does for SIMD scoring anyway —
    * which also makes the Σ an exact integer sum, independent of the
    * accumulation order a float sum would inherit from partitioning.
    * Returns (query_id, cand_id, rnk).
    */
  def adcTopK(queries: DataFrame, codes: DataFrame, codebooks: DataFrame,
              m: Int, subDim: Int, k: Int): DataFrame = {
    val qsubs = subVectors(queries, "query_id", m, subDim)
    val dt = qsubs.join(broadcast(codebooks), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        floor(l2sq(col("sv"), col("cb")) * (1L << 20)).as("d"))
    val scored = codes.join(broadcast(dt), Seq("sub", "code"))
      .filter(col("query_id") =!= col("cand_id"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("d")).cast("long").as("adist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("cand_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("rnk"))
  }

  /** ADC shortlist + exact re-rank: approximate distance prunes to
    * `shortlist` candidates, exact cosine ranks the survivors — recall of
    * the exact metric at compressed-scan cost.
    */
  def adcTopKRerank(queries: DataFrame, corpus: DataFrame, codes: DataFrame,
                    codebooks: DataFrame, m: Int, subDim: Int, k: Int,
                    shortlist: Int): DataFrame = {
    val cand = adcTopK(queries, codes, codebooks, m, subDim, shortlist)
      .select(col("query_id"), col("cand_id"))
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("cand_id"), col("embedding").as("c_emb"))
    val scored = cand.join(broadcast(q), Seq("query_id")).join(c, Seq("cand_id"))
      .select(col("query_id"), col("cand_id"),
        graft.functions.VectorFunctions.cosine(col("q_emb"), col("c_emb")).as("cosine"))
    Ann.topKPerQuery(scored, k)
  }
}
