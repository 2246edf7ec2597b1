package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the clustering-structure metric on
  * similarity/co-occurrence graphs (near-dup pair graphs are unions of
  * cliques; a co-purchase graph's triangle density measures basket
  * coherence). Sibling of the connected-components operators in
  * [[graft.dedup.Dedup]].
  *
  * The naive triple self-join explodes on high-degree nodes (a hub of
  * degree d contributes d² wedge rows). The standard fix (Suri &
  * Vassilvitskii's MR triangle counting): orient every edge from the
  * lower-ranked to the higher-ranked endpoint under the total order
  * (degree, id). Every triangle then has exactly ONE source node with
  * two outgoing oriented edges, and each node's out-degree is bounded by
  * O(√m) on any graph (the arboricity bound) — so the wedge join is
  * bounded even with power-law hubs: the hub's edges point INTO it and
  * generate no wedges.
  *
  * Shuffles: degree aggregate, two orientation joins, wedge self-join,
  * closing-edge semi-join — all hash exchanges on node/edge keys, no
  * broadcast of anything data-sized.
  */
object Graph {
  /** Count triangles in an undirected simple graph.
    *
    * @param edges (src, dst) pairs; may contain duplicates, reversed
    *              copies, and self-loops — canonicalized and deduped here.
    * @return one row: (n_nodes, n_edges, n_triangles)
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      // consumed by three branches (degree, orientation, count): one
      // eager materialization beats three edge-build recomputes
      .localCheckpoint(true)
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // orient a->b iff (deg(a), a) < (deg(b), b): a total order, so each
    // undirected edge gets exactly one direction
    val oriented = e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), Seq("a"))
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), Seq("b"))
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("w"))
      // consumed by the adjacency build and twice by the counting join
      .localCheckpoint(true)
    // Count per EDGE by out-neighbor-list intersection rather than
    // materializing the wedge set: a dense graph's wedge count dwarfs its
    // edge count (the sf0.1 co-purchase graph: 41M wedges over 1.2M
    // edges), and shuffling wedge rows into a semi-join is pure overhead
    // when the closing test can run inside one projection. Under the
    // acyclic orientation each triangle's nodes rank r1<r2<r3 and it is
    // counted exactly once — on edge r1→r2, as common out-neighbor r3.
    // The adjacency table has one row per NODE (≤ out-degree O(√m)
    // elements each): small enough to broadcast on mid-size graphs, a
    // plain hash join at 100 TB.
    val adj = oriented.groupBy(col("u"))
      .agg(sort_array(collect_list(col("w"))).as("nbrs"))
    val tri = oriented
      .join(adj.select(col("u"), col("nbrs").as("n1")), Seq("u"))
      .join(adj.select(col("u").as("w"), col("nbrs").as("n2")), Seq("w"))
      .select(size(array_intersect(col("n1"), col("n2"))).cast("long").as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val edgeCount = e.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(edgeCount).crossJoin(tri)
  }
}
