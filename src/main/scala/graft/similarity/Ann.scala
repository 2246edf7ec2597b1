package graft.similarity

import graft.PlanProbe.CkptOps
import graft.functions.VectorFunctions.{cosine, norm}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an `array<float>` embedding column.
  *
  * Brute force is the exact baseline: broadcast the (small) query set against
  * the corpus — a narrow map-side pass, one shuffle for the per-query top-k.
  * The IVF variant is the 100 TB path: corpus rows are assigned to their
  * nearest centroid once (narrow), and a query only scans its `nprobe`
  * closest centroid partitions.
  */
object Ann {
  /** (id, embedding) → (id, demb double[], nrm) with the L2 norm computed
    * ONCE per row. Per-pair work then drops to a single dot-product
    * aggregate instead of three (dot + both norms re-derived), and the
    * float→double casts happen once — measured 4× on the all-pairs path.
    * Same double arithmetic order as cosine(), so values are bit-identical.
    */
  private def withNorm(df: DataFrame, idCol: String, prefix: String): DataFrame =
    df.select(col(idCol),
      col("embedding").as(s"${prefix}emb"),
      norm(col("embedding")).as(s"${prefix}nrm"))

  private def ddot(a: Column, b: Column): Column =
    graft.functions.NativeExpressions.vec_dot(a, b)

  /** Exact top-k neighbors by cosine for each query row.
    * @param queries (query_id, embedding) — small enough to broadcast.
    * @param corpus  (cand_id, embedding)
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries, "query_id", "q_")
    val c = withNorm(corpus, "cand_id", "c_")
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (ddot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm"))).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** All pairs (idA < idB) with cosine above a threshold — the exact
    * baseline for embedding near-dup detection. O(n²) by definition: keep
    * for corpus slices / verification; the 100 TB path is LSH or IVF
    * bucketing first, exact cosine only within buckets.
    */
  def allPairsCosineAbove(corpus: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val a = withNorm(corpus, idCol, "a_").withColumnRenamed(idCol, "id_a")
    val b = withNorm(corpus, idCol, "b_").withColumnRenamed(idCol, "id_b")
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (ddot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm"))).as("cos"))
      .filter(col("cos") > threshold)
  }

  /** Deterministic hyperplane component in [-1, 1): md5 of the coordinate
    * triple, first 6 hex digits scaled. Same values on any JVM/engine.
    */
  def hyperplaneComponent(band: Int, bit: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$band:$bit:$dim".getBytes("UTF-8"))
      .take(3).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16).toDouble / (1 << 24)) * 2.0 - 1.0
  }

  /** Rank + truncate scored (query_id, cand_id, cosine) pairs. */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("rnk"))
  }

  /** Random-hyperplane LSH band keys: `bands` keys per vector, each from
    * `bitsPerBand` sign bits of projections onto fixed pseudo-random
    * hyperplanes. Components derive from md5 of (band, bit, dim) — fully
    * deterministic across runs and machines. Two vectors at angle θ agree
    * on one bit with probability 1 - θ/π, so near-duplicates collide in at
    * least one band with high probability while the corpus spreads across
    * 2^bitsPerBand buckets per band. Narrow, no shuffle until the band-key
    * groupBy. The projections run in a loop-codegen'd native expression
    * ([[graft.functions.NativeExpressions.hyperplane_band_bits]]); the
    * equivalent builtin tree unrolls bands×bits×dim product terms, blows
    * the 64KB JVM method limit, and drops the whole stage to interpreted
    * eval.
    *
    * Null/ragged semantics (deliberate): a null embedding yields null band
    * keys and drops out of candidate generation (it can match nothing);
    * arrays shorter than `dim` project over their prefix.
    */
  def hyperplaneBandKeys(emb: Column, dim: Int, bands: Int, bitsPerBand: Int): Column = {
    val bandVals = hyperplaneBandValues(emb, dim, bands, bitsPerBand)
    array((0 until bands).map { b =>
      concat(lit(s"$b:"), element_at(bandVals, b + 1).cast("string"))
    }: _*)
  }

  /** The raw band VALUES array (one int of `bitsPerBand` sign bits per
    * band) behind [[hyperplaneBandKeys]]. For LARGE band counts, explode
    * THIS and derive the key string from (pos, value) — the key-array
    * form expands into `bands` copies of the projection expression, and a
    * fused stage containing 64 inlined native loops exceeds the JIT's
    * huge-method threshold and drops the whole stage to interpreted
    * bytecode (measured 30× on the banded near-dup join).
    */
  def hyperplaneBandValues(emb: Column, dim: Int, bands: Int, bitsPerBand: Int): Column = {
    val planes = Array.tabulate(bands * bitsPerBand * dim) { flat =>
      val b = flat / (bitsPerBand * dim)
      val i = flat / dim % bitsPerBand
      val j = flat % dim
      hyperplaneComponent(b, i, j)
    }
    graft.functions.NativeExpressions
      .hyperplane_band_bits(emb, planes, bands, bitsPerBand, dim)
  }

  /** ANN via hyperplane LSH: candidates collide in ≥1 band, then exact
    * cosine re-rank. Recall < 1 by design; the shuffle is one groupBy on
    * ~uniform band keys — never a cross join.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
              bands: Int = 3, bitsPerBand: Int = 4): DataFrame = {
    val q = withNorm(queries, "query_id", "q_")
      .withColumn("band", explode(hyperplaneBandKeys(col("q_emb"), dim, bands, bitsPerBand)))
    val c = withNorm(corpus, "cand_id", "c_")
      .withColumn("band", explode(hyperplaneBandKeys(col("c_emb"), dim, bands, bitsPerBand)))
    val scored = c.join(broadcast(q), Seq("band"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (ddot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm"))).as("cosine"))
      .distinct()
    topKPerQuery(scored, k)
  }

  /** Range search — ALL corpus vectors within the cosine threshold of
    * each query (the "every neighbor" complement of top-k: dedup
    * verification, recall evaluation, radius-bounded retrieval).
    * Candidates from hyperplane-LSH band collisions (the
    * [[graft.dedup.Dedup.embedNearDupLsh]] machinery, asymmetric:
    * query bands ⋈ corpus bands, never query × corpus), exact cosine
    * verify on the deduped candidate pairs. Recall follows the band
    * parameterization — the default 64×4 regime is the one the
    * embedding near-dup gate pins recall-complete at threshold 0.4 on
    * the fixture; production thresholds prune far harder (LshSpec).
    *
    * @param queries (query_id, embedding)
    * @param corpus  (cand_id, embedding)
    * @return (query_id, cand_id) with cosine > threshold, self-matches
    *         (same id) excluded
    */
  def rangeSearch(queries: DataFrame, corpus: DataFrame, dim: Int,
                  threshold: Double, bands: Int = 64,
                  bitsPerBand: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions.norm
    val qb = queries.select(col("query_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm")).ckpt
    val cb = corpus.select(col("cand_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("c_nrm")).ckpt
    // posexplode'd band VALUES (one native-loop call site) — the
    // key-array form inlines `bands` projection loops into the fused
    // collision join and drops the stage to interpreted bytecode
    def bandKeys(df: DataFrame, idCol: String, embCol: String): DataFrame =
      df.select(col(idCol),
          posexplode(hyperplaneBandValues(col(embCol), dim, bands, bitsPerBand)))
        .select(col(idCol),
          concat(col("pos").cast("string"), lit(":"), col("col").cast("string"))
            .as("band"))
    val cand = bandKeys(cb, "cand_id", "c_emb")
      .join(bandKeys(qb, "query_id", "q_emb").hint("broadcast"), Seq("band"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id")).distinct()
    cand.join(qb, Seq("query_id")).join(cb, Seq("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (ddot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
          .as("cosine"))
      .filter(col("cosine") > threshold)
      .select(col("query_id"), col("cand_id"))
  }

  /** Lloyd-iteration centroid training for IVF, fully declarative: assign
    * (narrow, centroids broadcast) → per-centroid mean (one shuffle on the
    * centroid id) → repeat. Seeds are deterministic corpus rows. The means
    * use element-wise aggregation over posexploded coordinates — a
    * codegen'd hash aggregate, no UDAF.
    */
  def trainCentroids(corpus: DataFrame, k: Int, iterations: Int): DataFrame = {
    // deterministic pseudo-random seeds without a global pass: the k rows
    // with the smallest md5(id) — orderBy(...).limit(k) plans as
    // TakeOrderedAndProject (per-partition top-k, driver merges k rows),
    // so no single-partition sort and no driver-side count() over the
    // corpus. centroid_id comes from a window over the k seed rows only.
    val seeds = corpus
      .select(col("cand_id"), col("embedding"),
        md5(col("cand_id").cast("string")).as("__h"))
      .orderBy(col("__h"), col("cand_id")).limit(k)
    val numbered = seeds
      .withColumn("centroid_id",
        row_number().over(Window.orderBy(col("__h"), col("cand_id"))).cast("long") - 1)
      .select(col("centroid_id"), col("embedding"))
    lloyd(corpus, numbered, iterations)
  }

  /** Locality-seeded centroid training (the r4 queue's "IVF build on the
    * space-ordered corpus"): instead of k pseudo-random rows, seed from
    * the k most-POPULATED hyperplane-LSH cells — each seed is the
    * element-wise mean of one cell, so seeds start where the data mass
    * is and are spread apart by construction (different cells differ in
    * ≥1 sign bit). Same Lloyd refinement afterwards. Cost: one narrow
    * signature projection + one count aggregate + means for k cells
    * (semi-joined, not the whole corpus); the cell top-k is a
    * TakeOrderedAndProject like the row-seeded path — no global sort, no
    * driver count().
    */
  def trainCentroidsLsh(corpus: DataFrame, k: Int, dim: Int,
                        iterations: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // enough cells that the top-k are genuinely distinct localities: at
    // least 4k cells, capped at 2^16 signatures
    val bits = math.min(16, math.max(2, 64 - java.lang.Long.numberOfLeadingZeros(4L * k - 1)))
    val sig = element_at(hyperplaneBandValues(col("embedding"), dim, 1, bits), 1)
    val cells = corpus.select(col("cand_id"), col("embedding"), sig.as("__sig"))
    val topCells = cells.groupBy(col("__sig")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__sig")).limit(k)
    val seeds = cells.join(broadcast(topCells), Seq("__sig"))
      .select(col("__sig"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("__sig"), col("pos"))
      .agg(avg(col("x").cast("double")).as("mx"))
      .groupBy(col("__sig"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pairs"))
      .select(col("__sig"),
        transform(col("pairs"), p => p.getField("mx").cast("float")).as("embedding"))
      .withColumn("centroid_id",
        row_number().over(Window.orderBy(col("__sig"))).cast("long") - 1)
      .select(col("centroid_id"), col("embedding"))
    lloyd(corpus, seeds, iterations)
  }

  /** Lloyd refinement from the given seeds: assign (narrow, centroids
    * broadcast) → per-centroid element-wise mean (one shuffle on the
    * centroid id) → repeat.
    */
  private def lloyd(corpus: DataFrame, seeds: DataFrame,
                    iterations: Int): DataFrame = {
    var centroids = seeds
    for (_ <- 1 to iterations) {
      val assigned = ivfAssign(corpus, centroids)
      val means = assigned
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("x").cast("double")).as("mx"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pairs"))
        .select(col("centroid_id"),
          transform(col("pairs"), p => p.getField("mx").cast("float")).as("embedding"))
      centroids = means.ckpt
    }
    centroids
  }

  /** Assign each corpus row to its nearest centroid (by cosine).
    * Centroids are broadcast; assignment is narrow — which makes the IVF
    * index INCREMENTAL for free: with centroids frozen, assigning only a
    * delta and unioning with the stored assignment table is row-identical
    * to re-assigning the whole corpus (AnnSpec pins this), so daily
    * ingests never re-touch the indexed corpus.
    * @param centroids (centroid_id, embedding)
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    // norms once per row on each side — recomputing them per (row,
    // centroid) pair re-runs a 64-element interpreted fold |centroids|
    // times per row (same arithmetic as cosine(): dot/(na*nb), so the
    // assignment is bit-identical)
    val c = corpus.select(col("cand_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("c_nrm"))
    val ct = centroids.select(col("centroid_id"), col("embedding").as("ct_emb"),
      norm(col("embedding")).as("ct_nrm"))
    val scored = c.crossJoin(broadcast(ct))
      .select(col("cand_id"), col("c_emb"), col("centroid_id"),
        (ddot(col("c_emb"), col("ct_emb")) / (col("c_nrm") * col("ct_nrm"))).as("sim"))
    val w = Window.partitionBy(col("cand_id")).orderBy(col("sim").desc, col("centroid_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("cand_id"), col("c_emb").as("embedding"), col("centroid_id"))
  }

  /** IVF search: probe only the `nprobe` centroids closest to each query,
    * then exact cosine within those partitions. Returns (query_id, cand_id,
    * rnk) like bruteForceTopK (recall < 1 by design).
    */
  def ivfTopK(queries: DataFrame, assigned: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"))
    val ct = centroids.select(col("centroid_id"), col("embedding").as("ct_emb"))
    val qProbe = q.crossJoin(broadcast(ct))
      .select(col("query_id"), col("q_emb"), col("centroid_id"),
        cosine(col("q_emb"), col("ct_emb")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("centroid_id"))
    val probes = qProbe.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= nprobe).select(col("query_id"), col("q_emb"), col("centroid_id"))
    val scored = assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        cosine(col("q_emb"), col("embedding")).as("cosine"))
    topKPerQuery(scored, k)
  }
}
