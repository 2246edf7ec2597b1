package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd k-means over embedding columns, exactly replayable in any engine.
  *
  * The training-data use: bucket a corpus's embeddings into k topical
  * clusters for stratified sampling, mixture balancing, or IVF-style
  * partition pruning (the same centroids [[Ann]] probes). The reference's
  * warehouse never clusters — this is part of the LLM-pipeline surface
  * layered on top (reference: README.md:24, the replicated store the
  * pipeline feeds).
  *
  * House determinism contract: floats never survive into the arithmetic.
  * Each coordinate quantizes ONCE to milli-units (⌊x·1000⌋ — one IEEE
  * double multiply + floor, bit-identical everywhere); from there every
  * distance is an exact long, every centroid update a sign-carried
  * integer mean, every assignment a total order on (dist, centroid id).
  * Two engines running this walk identical trajectories — no epsilon, no
  * "close enough" — which is what makes the gate a hash compare instead
  * of a tolerance test. The quantization error (≤ 0.1% of coordinate
  * range) is far below any clustering decision worth making.
  *
  * Scale shape per round: the flat (vec_id, i, x) table is computed once
  * and reused; the centroid table is k·dim rows and BROADCASTS into the
  * distance join, so each round is one map-side join + one (vec_id, cid)
  * hash aggregate + one window argmin + one (cid, i) hash aggregate.
  * Nothing data-sized ever sits on a single partition; rounds are a
  * fixed count (no driver-side convergence scan of the data).
  *
  * CONTRACT — k vs corpus size: the broadcast above is safe only while
  * the centroid table is metadata-sized, and the two seeding modes
  * differ exactly there. `seedMod` seeding takes every seedMod-th id,
  * so k = n/seedMod GROWS WITH THE CORPUS under a constant seedMod —
  * fine for gate-scale determinism tests, wrong at 100× unless the
  * caller scales seedMod with n. [[seedsTopK]] seeding takes a FIXED k
  * by hash rank — k is an API constant, independent of n, and is the
  * form production callers should use.
  */
object KMeans {

  /** Deterministic FIXED-k seed selection: the k ids ranking smallest
    * under (md5(id), id) — an engine-portable hash rank (the house
    * md5-on-decimal-string idiom, replayable as
    * `ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT k` in any
    * SQL engine), uniform over the corpus, and independent of the
    * corpus size: the centroid table stays k·dim rows at any n.
    */
  def seedsTopK(vecs: DataFrame, id: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    vecs.select(id.cast("long").as("vec_id")).distinct()
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
  }

  /** Shared Lloyd chain: returns the milli-quantized flat table, the
    * final round's full distance table (vec_id × centroid), and the
    * argmin assignment derived from it. Seeding is injected as a
    * predicate on the flat table ids.
    */
  private def lloydCoreWith(vecs: DataFrame, id: Column, vec: Column,
                            seed: DataFrame => DataFrame, iterations: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    import graft.PlanProbe.CkptOps
    val flat = vecs
      .select(id.cast("long").as("vec_id"), posexplode(vec))
      .select(col("vec_id"), col("pos").cast("long").as("i"),
        floor(col("col").cast("double") * 1000).cast("long").as("x"))
      .ckpt
    var cent = seed(flat)
      .select(col("vec_id").as("cid"), col("i"), col("x").as("cx"))
    var d: DataFrame = null
    var assign: DataFrame = null
    for (_ <- 1 to iterations) {
      d = flat.join(broadcast(cent), Seq("i"))
        .groupBy(col("vec_id"), col("cid"))
        .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("d"))
      assign = d
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cid"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"))
      // sign-carried integer mean: floor ≡ trunc on the nonneg magnitude,
      // so Spark's trunc-div and an oracle's floor-div agree on negatives
      cent = flat.join(assign, Seq("vec_id"))
        .groupBy(col("cid"), col("i"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .select(col("cid"), col("i"),
          when(col("s") >= 0, expr("s div n"))
            .otherwise(-expr("(-s) div n")).as("cx"))
    }
    (flat, d, assign)
  }

  /** seedMod seeding (k = n/seedMod — see the object contract note). */
  private def lloydCore(vecs: DataFrame, id: Column, vec: Column,
                        seedMod: Long, iterations: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(seedMod >= 1, s"seedMod must be >= 1, got $seedMod")
    lloydCoreWith(vecs, id, vec,
      _.filter(col("vec_id") % seedMod === 0), iterations)
  }

  /** Fixed-k hash-rank seeding ([[seedsTopK]] — k independent of n). */
  private def lloydCoreK(vecs: DataFrame, id: Column, vec: Column,
                         k: Int, iterations: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val seeds = seedsTopK(vecs, id, k)
    lloydCoreWith(vecs, id, vec,
      _.join(broadcast(seeds), Seq("vec_id")), iterations)
  }

  /** `iterations` assignment passes with centroid re-estimation between
    * them; initial centroids are the vectors whose id ≡ 0 (mod seedMod).
    * NOTE: k = n/seedMod grows with the corpus — prefer [[lloydMilliK]]
    * at scale (object contract note).
    *
    * Output: (vec_id, cluster_id) — cluster_id is the seed id of the
    * centroid's lineage, a stable, engine-neutral label.
    */
  def lloydMilli(vecs: DataFrame, id: Column, vec: Column,
                 seedMod: Long, iterations: Int): DataFrame = {
    val (_, _, assign) = lloydCore(vecs, id, vec, seedMod, iterations)
    assign.select(col("vec_id"), col("cid").as("cluster_id"))
  }

  /** [[lloydMilli]] with FIXED-k hash-rank seeding ([[seedsTopK]]): the
    * centroid table is k·dim rows no matter the corpus size, so the
    * broadcast contract holds at any n. Same exact-integer trajectory
    * discipline; same output shape.
    */
  def lloydMilliK(vecs: DataFrame, id: Column, vec: Column,
                  k: Int, iterations: Int): DataFrame = {
    val (_, _, assign) = lloydCoreK(vecs, id, vec, k, iterations)
    assign.select(col("vec_id"), col("cid").as("cluster_id"))
  }

  /** IVF top-k over the exact k-means index — the D19 loop closed into
    * similarity search: queries probe their `nprobe` nearest trained
    * centroids (by the SAME exact milli L2 the training used), the
    * candidate set is the union of those partitions' members (the
    * assignment table — the inverted file), and candidates rank by exact
    * integer L2 with cand_id as tie-break. Self-hits are excluded.
    * Recall follows from probe width, never from float luck: every stage
    * is exactly replayable, so the gate hash-compares.
    *
    * Scale shape: the centroid distance table already exists from the
    * Lloyd chain (one broadcast join); the probe→member expansion is an
    * equi-join on cid (partition-pruned search — the whole point of
    * IVF); the exact re-rank joins the narrow flat table twice on the
    * candidate pair list, |pairs|·dim rows, and the final top-k is a
    * per-query window over the bounded candidate fan-in.
    *
    * Output: (query_id, cand_id, dist_sq, rnk), rnk 1..k.
    */
  def ivfTopKMilli(vecs: DataFrame, id: Column, vec: Column,
                   seedMod: Long, iterations: Int, queryFilter: Column,
                   k: Int, nprobe: Int): DataFrame = {
    val core = lloydCore(vecs, id, vec, seedMod, iterations)
    ivfTopKFromCore(core, queryFilter, k, nprobe)
  }

  /** [[ivfTopKMilli]] over the FIXED-k trained index ([[lloydMilliK]]'s
    * seeding): `centroids` partitions regardless of corpus size.
    */
  def ivfTopKMilliK(vecs: DataFrame, id: Column, vec: Column,
                    centroids: Int, iterations: Int, queryFilter: Column,
                    k: Int, nprobe: Int): DataFrame = {
    val core = lloydCoreK(vecs, id, vec, centroids, iterations)
    ivfTopKFromCore(core, queryFilter, k, nprobe)
  }

  private def ivfTopKFromCore(core: (DataFrame, DataFrame, DataFrame),
                              queryFilter: Column, k: Int,
                              nprobe: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val (flat, d, assign) = core
    val probes = d.filter(queryFilter)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cid"))))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cid"))
    val cands = probes
      .join(assign.select(col("vec_id").as("cand_id"), col("cid")), Seq("cid"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"))
    val dist = cands
      .join(flat.select(col("vec_id").as("query_id"), col("i"),
        col("x").as("xq")), Seq("query_id"))
      .join(flat.select(col("vec_id").as("cand_id"), col("i"),
        col("x").as("xc")), Seq("cand_id", "i"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum((col("xq") - col("xc")) * (col("xq") - col("xc"))).as("dist_sq"))
    dist
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("dist_sq"), col("cand_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("dist_sq"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Per-cluster quality of [[lloydMilli]]'s assignment: the simplified
    * (centroid-based, SQUARED-distance) silhouette — for each point,
    * a = squared distance to its own centroid, b = the minimum squared
    * distance to any OTHER centroid, s = (b − a)·10⁶ div max(a, b),
    * sign-carried; a point exactly on two centroids (max = 0) scores 0.
    * Centroids are the ones the final assignment was made against — the
    * question answered is "how decisively did the last pass assign",
    * which is the monitorable quantity (squared distances keep the whole
    * metric in exact integers; the classic sqrt form is irrational and
    * un-gateable — stated contract, same posture as R126's V²).
    *
    * Output: (cluster_id, n, mean_sil_ppm) — mean is the sign-carried
    * integer mean of member scores. Scale shape: reuses the final
    * round's (vec_id × k) distance table — one window over k rows per
    * point + one hash aggregate; nothing beyond the Lloyd chain itself.
    */
  def silhouetteMilli(vecs: DataFrame, id: Column, vec: Column,
                      seedMod: Long, iterations: Int): DataFrame =
    silhouetteFromCore(lloydCore(vecs, id, vec, seedMod, iterations))

  /** [[silhouetteMilli]] over the FIXED-k index ([[lloydMilliK]]). */
  def silhouetteMilliK(vecs: DataFrame, id: Column, vec: Column,
                       k: Int, iterations: Int): DataFrame =
    silhouetteFromCore(lloydCoreK(vecs, id, vec, k, iterations))

  private def silhouetteFromCore(
      core: (DataFrame, DataFrame, DataFrame)): DataFrame = {
    val (_, d, assign) = core
    val a = d.join(assign, Seq("vec_id", "cid"))
      .select(col("vec_id"), col("cid"), col("d").as("a"))
    val b = d.join(assign.withColumnRenamed("cid", "own"), Seq("vec_id"))
      .filter(col("cid") =!= col("own"))
      .groupBy(col("vec_id")).agg(min(col("d")).as("b"))
    val s = a.join(b, Seq("vec_id"))
      .select(col("vec_id"), col("cid"),
        when(greatest(col("a"), col("b")) === 0, lit(0L))
          .otherwise(
            signum(col("b") - col("a")).cast("long") *
              expr("abs(b - a) * 1000000 div greatest(a, b)")).as("s"))
    s.groupBy(col("cid").as("cluster_id"))
      .agg(sum(col("s")).as("ss"), count(lit(1)).as("n"))
      .select(col("cluster_id"), col("n"),
        (signum(col("ss")).cast("long") *
          expr("abs(ss) div n")).as("mean_sil_ppm"))
  }
}
