package graft.operators

import graft.PlanProbe.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-respecting graph traversal: paths must use edges in
  * non-decreasing timestamp order — information, goods, or contagion can
  * only flow FORWARD in time, which static reachability over the same
  * edge list silently gets wrong (a 2019 edge cannot carry influence
  * arriving in 2023). The replicated order graph is exactly this shape:
  * customer→supplier contact events stamped with the order date
  * (reference: README.md:24 — the warehouse's relationship questions,
  * here with the time dimension made honest).
  *
  * Exact contract: earliest-arrival labels. arr(seed, v) = the minimum
  * time at which v is reachable from seed along a time-respecting path
  * (waiting at a node is allowed — non-strict ≥). Seeds start at arr = 0
  * (before every edge). Each round is one full label-correcting pass —
  * candidates = settled labels joined to edges with t ≥ arr, then a
  * (seed, node) min — so a fixed round count replays as chained CTEs in
  * any engine (the R71/R134 fixed-trajectory posture); `rounds` bounds
  * the path HOP length, the standard budget on temporal BFS.
  *
  * Scale shape: per round one equi-join on the node key (edges
  * hash-partitioned on src) + one (seed, node) hash aggregate; the label
  * table is bounded by |seeds|·|nodes| — seed panels are small by
  * construction (a watchlist, not a corpus).
  */
object TemporalGraph {

  /** Earliest-arrival reachability from each seed within `rounds` hops.
    *
    * @param edges (src, dst, t) directed temporal edges, integer t
    * @param seeds one column `node`
    * @return (seed, node, arr) — every (seed, reachable node) with its
    *         earliest time-respecting arrival; seeds carry arr = 0
    */
  def earliestArrival(edges: DataFrame, seeds: DataFrame,
                      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col("src"), col("dst"), col("t").cast("long").as("t"))
      .ckpt
    var r = seeds.select(col("node").as("seed")).distinct()
      .select(col("seed"), col("seed").as("node"), lit(0L).as("arr"))
      .ckpt
    for (_ <- 1 to rounds) {
      val stepped = r.join(e, col("node") === col("src"))
        .filter(col("t") >= col("arr"))
        .select(col("seed"), col("dst").as("node"), col("t").as("arr"))
      r = r.unionByName(stepped)
        .groupBy(col("seed"), col("node"))
        .agg(min(col("arr")).as("arr"))
        .ckpt
    }
    r
  }

  /** Fastest-journey durations (Wu et al. 2014's third temporal-path
    * flavor): earliest arrival rewards starting EARLY, latest departure
    * rewards arriving LATE — the fastest journey minimizes the time IN
    * TRANSIT, arrival − departure, over all time-respecting paths. The
    * trick that keeps it exact without pareto frontiers: a journey's
    * departure is the time of its FIRST edge, and the first edges out of
    * a seed are enumerable — so labels carry (seed, start) and run the
    * earliest-arrival recursion per start, and the answer reduces over
    * starts at the end. Label volume is |starts(seed)| × reach — the
    * price of exactness; seeds are a small panel by construction.
    *
    * @return (seed, node, dur) — minimum transit seconds over journeys
    *         of ≤ `rounds` hops; the seed itself reports 0
    */
  def fastestJourney(edges: DataFrame, seeds: DataFrame,
                     rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col("src"), col("dst"), col("t").cast("long").as("t"))
      .ckpt
    val starts = seeds.select(col("node").as("seed")).distinct()
      .join(e, col("seed") === col("src"))
      .select(col("seed"), col("t").as("start")).distinct()
    // per (seed, start): earliest arrival among journeys whose first
    // edge departs exactly at `start` (enforced by seeding arr = start
    // and requiring t >= arr as usual)
    var r = starts
      .select(col("seed"), col("start"), col("seed").as("node"),
        col("start").as("arr"))
      .ckpt
    for (_ <- 1 to rounds) {
      val stepped = r.join(e, col("node") === col("src"))
        .filter(col("t") >= col("arr"))
        .select(col("seed"), col("start"), col("dst").as("node"),
          col("t").as("arr"))
      r = r.unionByName(stepped)
        .groupBy(col("seed"), col("start"), col("node"))
        .agg(min(col("arr")).as("arr"))
        .ckpt
    }
    val best = r.filter(col("node") =!= col("seed"))
      .groupBy(col("seed"), col("node"))
      .agg(min(col("arr") - col("start")).as("dur"))
    seeds.select(col("node").as("seed")).distinct()
      .select(col("seed"), col("seed").as("node"), lit(0L).as("dur"))
      .unionByName(best)
  }

  /** Latest-departure labels — the reverse question: how LATE can each
    * node still start and reach the target along a time-respecting path
    * (the recovery-planning / last-safe-moment query)? dep(target) =
    * `horizon` (after every edge); dep(v) = max over edges (v, w, t)
    * with t ≤ dep(w) of t — you can leave v at the edge's own time. The
    * max-label mirror of [[earliestArrival]], same dominance argument
    * (a LATER departure enables a superset of usable edges), same fixed
    * `rounds` = hop budget, same chained-CTE replay.
    *
    * @param edges   (src, dst, t) directed temporal edges, integer t
    * @param targets one column `node`
    * @return (target, node, dep) — nodes that can still reach target;
    *         targets carry dep = horizon
    */
  def latestDeparture(edges: DataFrame, targets: DataFrame, rounds: Int,
                      horizon: Long): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col("src"), col("dst"), col("t").cast("long").as("t"))
      .ckpt
    var r = targets.select(col("node").as("target")).distinct()
      .select(col("target"), col("target").as("node"),
        lit(horizon).as("dep"))
      .ckpt
    for (_ <- 1 to rounds) {
      val stepped = r.join(e, col("node") === col("dst"))
        .filter(col("t") <= col("dep"))
        .select(col("target"), col("src").as("node"), col("t").as("dep"))
      r = r.unionByName(stepped)
        .groupBy(col("target"), col("node"))
        .agg(max(col("dep")).as("dep"))
        .ckpt
    }
    r
  }
}
