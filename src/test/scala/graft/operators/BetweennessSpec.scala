package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BetweennessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  rounds: Int): Map[Long, Long] = {
    Graph.betweennessSeeded(edges.toDF("src", "dst"),
        seeds.toDF("node"), rounds)
      .as[(Long, Long)].collect().toMap
  }

  /** Driver-side Brandes with the identical per-edge ppm flooring. */
  private def ref(edges: Seq[(Long, Long)], seeds: Set[Long],
                  rounds: Int): Map[Long, Long] = {
    val und = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter(e => e._1 != e._2).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val acc = collection.mutable.Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
    for (s <- seeds) {
      // BFS with sigma
      var dist = Map(s -> 0)
      var sigma = Map(s -> BigInt(1))
      var frontier = Set(s)
      for (d <- 1 to rounds) {
        val next = collection.mutable.Map.empty[Long, BigInt]
        for (v <- frontier; w <- adj.getOrElse(v, Set.empty)
             if !dist.contains(w))
          next(w) = next.getOrElse(w, BigInt(0)) + sigma(v)
        dist = dist ++ next.keys.map(_ -> d)
        sigma = sigma ++ next
        frontier = next.keySet.toSet
      }
      // backward
      var delta = Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
      for (d <- rounds - 1 to 0 by -1) {
        val cur = collection.mutable.Map.empty[Long, BigInt]
        for ((v, dv) <- dist if dv == d) {
          var t = BigInt(0)
          for (w <- adj.getOrElse(v, Set.empty)
               if dist.get(w).contains(d + 1))
            t += sigma(v) * (1000000 + delta(w)) / sigma(w)
          cur(v) = t
        }
        delta = delta ++ cur
        if (d > 0) cur.foreach { case (v, t) => acc(v) = acc(v) + t }
      }
      // deepest-level nodes enter with delta 0 (they are in the output)
      for ((v, dv) <- dist if dv == rounds) acc(v) = acc(v) + 0
    }
    acc.map { case (k, v) => k -> v.toLong }.toMap
  }

  test("path graph: the middle node brokers everything") {
    // 1-2-3: from seed 1, node 2 carries the path to 3
    val got = run(Seq((1L, 2L), (2L, 3L)), Seq(1L), 2)
    // delta(2) = sigma2*(1e6 + delta3)/sigma3 = 1*(1e6+0)/1 = 1e6
    assert(got == Map(2L -> 1000000L, 3L -> 0L))
  }

  test("diamond: two equal paths halve the dependency") {
    // 1-2-4, 1-3-4: sigma(4)=2; delta(2) = 1*(1e6+0)/2 = 500000
    val got = run(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), Seq(1L), 2)
    assert(got(2L) == 500000L && got(3L) == 500000L && got(4L) == 0L)
  }

  test("matches the flooring reference on a mesh with multiple seeds") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 6L),
      (6L, 3L), (2L, 6L), (5L, 7L), (7L, 8L), (4L, 8L))
    for (r <- 1 to 4)
      assert(run(edges, Seq(1L, 5L), r) == ref(edges, Set(1L, 5L), r),
        s"rounds=$r diverged")
  }

  test("seeds themselves are excluded from the centrality sum") {
    val got = run(Seq((1L, 2L), (2L, 3L)), Seq(1L, 3L), 2)
    assert(!got.contains(1L) && !got.contains(3L) || {
      // 1 and 3 may appear only as NON-seed targets of the other seed's
      // walk — in a 3-path they are reached at dist 2 with delta 0
      got.getOrElse(1L, 0L) == 0L && got.getOrElse(3L, 0L) == 0L
    })
    // node 2 brokers for both seeds: 1e6 from each side
    assert(got(2L) == 2000000L)
  }

  test("disconnected nodes never appear") {
    val got = run(Seq((1L, 2L), (10L, 11L)), Seq(1L), 3)
    assert(!got.contains(10L) && !got.contains(11L))
  }

  test("vectorized and row BFS paths agree bit-for-bit") {
    // force the row fallback by zeroing the vector seed-width bound,
    // then compare against the default (vector) path on the same input
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 6L),
      (6L, 3L), (2L, 6L), (5L, 7L), (7L, 8L), (4L, 8L))
    val seeds = Seq(1L, 5L, 7L)
    def all(r: Int) = {
      val vec = run(edges, seeds, r)
      val sp = Graph.shortestPathCounts(edges.toDF("src", "dst"),
          seeds.toDF("node"), r)
        .as[(Long, Long, Long, Long)].collect().toSet
      spark.conf.set("spark.graft.bfsVectorMaxSeeds", "0")
      try {
        val row = run(edges, seeds, r)
        val spRow = Graph.shortestPathCounts(edges.toDF("src", "dst"),
            seeds.toDF("node"), r)
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(vec == row, s"betweenness diverged at rounds=$r")
        assert(sp == spRow, s"shortestPathCounts diverged at rounds=$r")
      } finally spark.conf.unset("spark.graft.bfsVectorMaxSeeds")
    }
    (1 to 3).foreach(all)
  }

  // ------------------------------------------------- R134 eigenvector

  private def runEv(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.eigenvectorCentrality(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  /** Driver-side power iteration with the identical flooring. */
  private def refEv(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .filter(e => e._1 != e._2).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var x: Map[Long, BigInt] = adj.keys.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to iters) {
      val raw = adj.map { case (v, ns) => v -> ns.map(x).sum }
      val mx = raw.values.max
      x = raw.map { case (v, r) => v -> r * 1000000 / mx }
    }
    x.map { case (k, v) => k -> v.toLong }
  }

  test("eigenvector: star center is pinned at 10^6, leaves collapse") {
    val star = (2L to 6L).map(l => (1L, l))
    val got = runEv(star, 3)
    assert(got(1L) == 1000000L)
    assert((2L to 6L).forall(l => got(l) == got(2L) && got(l) < 1000000L))
    assert(got == refEv(star, 3))
  }

  test("eigenvector: regular graphs are uniform at exactly 10^6") {
    // a 4-cycle: every node degree 2 -> stays the top score forever
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(runEv(cycle, 4).values.toSet == Set(1000000L))
  }

  test("eigenvector: matches the flooring reference on a mesh") {
    val mesh = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 6L),
      (6L, 3L), (2L, 6L), (5L, 7L))
    for (it <- 1 to 4)
      assert(runEv(mesh, it) == refEv(mesh, it), s"iterations=$it diverged")
  }

  // ----------------------------------------------- R135 assortativity

  private def runAssort(edges: Seq[(Long, Long)]): Option[Long] =
    Graph.assortativity(edges.toDF("src", "dst"))
      .select(org.apache.spark.sql.functions.col("assortativity_ppm"))
      .as[Option[Long]].collect().head

  test("assortativity: a regular graph has no degree variance (NULL)") {
    assert(runAssort(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).isEmpty)
  }

  test("assortativity: a star is maximally disassortative (-10^6)") {
    // hub degree 5 always pairs with leaf degree 1: perfect anticorrelation
    val star = (2L to 6L).map(l => (1L, l))
    assert(runAssort(star).contains(-1000000L))
  }

  test("assortativity: two cliques of different sizes are assortative") {
    // K3 + K4 disjoint: within each clique degrees are equal -> r = +1e6
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val k4 = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    assert(runAssort(k3 ++ k4).contains(1000000L))
  }

  // -------------------------------------------------- R136 modularity

  private def runMod(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Long, Long)] = {
    Graph.modularity(edges.toDF("src", "dst"), labels.toDF("node", "lbl"))
      .as[(Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("modularity: two disjoint cliques under their own labels") {
    // K3 + K3 disjoint, perfect labeling: m=6, each c: e_c=3, d_c=6
    // N_c = 4*6*3 - 36 = 36; contrib = 36e6/144 = 250000 each (Q = 1/2)
    val k3a = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val k3b = Seq((11L, 12L), (12L, 13L), (11L, 13L))
    val labels = (1L to 3L).map(_ -> 1L) ++ Seq(11L, 12L, 13L).map(_ -> 2L)
    val got = runMod(k3a ++ k3b, labels)
    assert(got(1L) == ((3L, 3L, 6L, 250000L)))
    assert(got(2L) == ((3L, 3L, 6L, 250000L)))
  }

  test("modularity: everything in ONE community scores exactly 0") {
    // e_c = m, d_c = 2m -> N = 4m^2 - 4m^2 = 0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val labels = (1L to 4L).map(_ -> 7L)
    assert(runMod(edges, labels)(7L) == ((4L, 5L, 10L, 0L)))
  }

  test("modularity: an anti-community labeling goes NEGATIVE") {
    // bipartite split of a clique: no intra edges, all degree inside
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val labels = Seq(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L)
    val got = runMod(k4, labels)
    // m=6, per side: e_c=1 (the 1-3 / 2-4 edge), d_c=6
    // N_c = 24*1 - 36 = -12; contrib = -(12e6 div 144) = -83334? exact:
    // 12*1e6 = 12000000 // 144 = 83333 -> -83333
    assert(got(1L)._4 == -83333L && got(2L)._4 == -83333L)
  }
}
