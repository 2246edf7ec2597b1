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
    val out1 = oriented.select(col("u"), col("w").as("v1"))
    val out2 = oriented.select(col("u"), col("w").as("v2"))
    val wedges = out1.join(out2, Seq("u")).filter(col("v1") < col("v2"))
    val closing = oriented.select(
      least(col("u"), col("w")).as("v1"), greatest(col("u"), col("w")).as("v2"))
    // the closing edge of a wedge (v1, v2) may be oriented either way;
    // compare on the canonical (min, max) form
    val tri = wedges.select(col("v1"), col("v2"))
      .join(closing, Seq("v1", "v2"), "left_semi")
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val edgeCount = e.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(edgeCount)
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }
}
