package graft.operators

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial grid operators: all-pairs radius join, radius-bounded kNN, and
  * grid-density (DBSCAN-style) clustering over integer point coordinates.
  *
  * The reference replicates order/customer tables that in production carry
  * geo attributes (delivery coordinates, store locations); proximity
  * questions ("pairs of customers within r", "k nearest depots", "dense
  * demand pockets") are the spatial face of its warehouse workload
  * (reference: README.md:24 "real-time data warehouse" use case).
  *
  * The naive plan for every one of these is a cross join — O(n²)
  * comparisons, the first thing that dies at 100 TB. The scale shape here
  * is the UNIFORM GRID: bucket each point into a square cell of side r,
  * then any pair within Euclidean distance r is also within L∞ distance r,
  * so its two cells differ by at most 1 in each axis. Replicating ONE side
  * of the join into its 3×3 cell neighborhood turns proximity into a plain
  * equi-join on the cell key — hash-partitioned, AQE-skew-handled, shuffle
  * volume 9·|narrow key projection| + |points|, never n². Every distance
  * is exact integer arithmetic ((Δx)²+(Δy)² ≤ r² in long), so results
  * hash-match any engine bit-for-bit — no float epsilon anywhere.
  */
object Spatial {

  /** All pairs (a, b), a < b, with squared Euclidean distance ≤ r².
    *
    * Output: (id_a, id_b, dist_sq) — dist_sq exact in long.
    *
    * Each left row replicates into its 3×3 neighbor cells; the right side
    * keeps its single home cell. A qualifying pair (a < b) surfaces
    * exactly once — b's home cell is unique and lies in a's neighborhood
    * (|cell delta| ≤ 1 per axis since d ≤ r ⇒ L∞ ≤ r) — so no distinct
    * over the join output is needed. Only the narrow (id, x, y, cell)
    * projection replicates; payload columns rejoin by id downstream if
    * needed.
    */
  def radiusJoin(points: DataFrame, id: Column, x: Column, y: Column,
                 r: Long): DataFrame = {
    require(r >= 1, s"radius must be >= 1, got $r")
    val p = points.select(id.cast("long").as("id"),
      x.cast("long").as("x"), y.cast("long").as("y"))
    val cx = floor(col("x") / r).cast("long")
    val cy = floor(col("y") / r).cast("long")
    val home = p.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), cx.as("gx"), cy.as("gy"))
    val probe = p
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        (cx + col("dx")).as("gx"), (cy + col("dy")).as("gy"))
    probe.join(home, Seq("gx", "gy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist_sq",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist_sq") <= r * r)
      .select(col("id_a"), col("id_b"), col("dist_sq"))
  }

  /** Radius-bounded k-nearest-neighbors: for each query point, the k
    * nearest other points WITHIN Euclidean distance r, ordered by
    * (dist_sq, id). Points farther than r are out of scope by contract —
    * that bound is what keeps the search a grid equi-join instead of an
    * all-pairs scan; a query with fewer than k in-radius neighbors
    * returns fewer rows (honest answer, not padding).
    *
    * Output: (query_id, cand_id, dist_sq, rnk), rnk 1..k.
    *
    * Queries replicate into their 3×3 neighborhood (the query set is the
    * small side — replicate it, not the corpus); candidates keep their
    * home cell. Per-query top-k is a window over the candidate fan-in,
    * partitioned by query — bounded by the in-radius neighbor count, not
    * the corpus.
    */
  def knnWithinRadius(queries: DataFrame, corpus: DataFrame,
                      id: Column, x: Column, y: Column,
                      r: Long, k: Int): DataFrame = {
    require(r >= 1, s"radius must be >= 1, got $r")
    require(k >= 1, s"k must be >= 1, got $k")
    val q = queries.select(id.cast("long").as("id"),
      x.cast("long").as("x"), y.cast("long").as("y"))
    val c = corpus.select(id.cast("long").as("id"),
      x.cast("long").as("x"), y.cast("long").as("y"))
    val cx = floor(col("x") / r).cast("long")
    val cy = floor(col("y") / r).cast("long")
    val probe = q
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id").as("query_id"), col("x").as("xq"), col("y").as("yq"),
        (cx + col("dx")).as("gx"), (cy + col("dy")).as("gy"))
    val home = c.select(col("id").as("cand_id"), col("x").as("xc"),
      col("y").as("yc"), cx.as("gx"), cy.as("gy"))
    val scored = probe.join(home, Seq("gx", "gy"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("dist_sq",
        (col("xq") - col("xc")) * (col("xq") - col("xc")) +
          (col("yq") - col("yc")) * (col("yq") - col("yc")))
      .filter(col("dist_sq") <= r * r)
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("dist_sq"), col("cand_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("dist_sq"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Grid-density clustering — the scalable skeleton of DBSCAN
    * (Ester et al. 1996 by way of grid condensation): bucket points into
    * cells of side `cellSize`, call a cell DENSE when it holds at least
    * `minPts` points, connect dense cells that touch in the 8-neighbor
    * sense, and label each dense cell's points with the minimum cell key
    * of its connected component. Points in sparse cells are noise and are
    * not returned.
    *
    * Output: (id, cluster_id) — cluster_id = min encoded cell key of the
    * component, a deterministic, engine-neutral label.
    *
    * Scale shape: the data-sized work is ONE hash aggregate (cell counts)
    * and one join back (point → its cell's label). Everything else —
    * adjacency of dense cells, connected components via alternating
    * large-star/small-star contraction ([[graft.dedup.Dedup.connectedComponentsStar]],
    * O(log n) rounds regardless of component diameter) — runs on the
    * CELL table, which is bounded by the occupied-cell count, orders of
    * magnitude below the point count at any density worth clustering.
    * Cell keys encode as gx·2²⁰ + gy (coordinates are nonneg; gy < 2²⁰
    * enforced), so the label stays one long.
    */
  def gridDensityCluster(points: DataFrame, id: Column, x: Column, y: Column,
                         cellSize: Long, minPts: Long): DataFrame = {
    require(cellSize >= 1, s"cellSize must be >= 1, got $cellSize")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val p = points.select(id.cast("long").as("id"),
      floor(x.cast("long") / cellSize).cast("long").as("gx"),
      floor(y.cast("long") / cellSize).cast("long").as("gy"))
    val dense = p.groupBy(col("gx"), col("gy"))
      .agg(count(lit(1)).as("npts"))
      .filter(col("npts") >= minPts)
      .withColumn("cell", col("gx") * 1048576L + col("gy"))
    // 8-neighbor adjacency among dense cells: replicate each dense cell
    // into its 3×3 neighborhood, equi-join on the neighbor's home key
    val probe = dense
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("cell").as("id_a"),
        (col("gx") + col("dx")).as("gx"), (col("gy") + col("dy")).as("gy"))
    val edges = probe.join(
        dense.select(col("cell").as("id_b"), col("gx"), col("gy")),
        Seq("gx", "gy"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // CC on the cell graph; singleton dense cells label themselves
    val lbl = Dedup.connectedComponentsStar(edges)
      .select(col("doc_id").as("cell"), col("cluster_id"))
    val labeled = dense.select(col("gx"), col("gy"), col("cell"))
      .join(lbl, Seq("cell"), "left")
      .select(col("gx"), col("gy"),
        coalesce(col("cluster_id"), col("cell")).as("cluster_id"))
    p.join(labeled, Seq("gx", "gy"))
      .select(col("id"), col("cluster_id"))
  }
}
