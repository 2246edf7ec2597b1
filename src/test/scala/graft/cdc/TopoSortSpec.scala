package graft.cdc

import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

class TopoSortSpec extends AnyFunSuite {
  test("schema FK graph orders parents before children") {
    val lv = TopoSort.levels(Tables.all, Tables.fkEdges).toMap
    assert(lv("region") == 0 && lv("part") == 0)
    assert(lv("nation") == 1)
    assert(lv("customer") == 2 && lv("supplier") == 2)
    assert(lv("orders") == 3 && lv("events") == 3)
    assert(lv("lineitem") == 4)
    assert(lv("documents") == 0 && lv("embeddings") == 0) // isolated roots
    // every edge respects the level order
    Tables.fkEdges.foreach { case (p, c) => assert(lv(p) < lv(c), s"$p->$c") }
  }

  test("cycles fall out as -1 leftovers, appended last (reference behavior)") {
    // a<->b cycle; d standalone; c under the cycle never resolves either
    val lv = TopoSort.levels(Seq("a", "b", "c", "d"),
      Seq("a" -> "b", "b" -> "a", "a" -> "c"))
    assert(lv.toMap == Map("d" -> 0, "a" -> -1, "b" -> -1, "c" -> -1))
    assert(lv.head._1 == "d") // resolvable nodes first, leftovers appended
  }

  test("deterministic: same input, same order") {
    val e = Tables.fkEdges
    assert(TopoSort.order(Tables.all, e) == TopoSort.order(Tables.all.reverse, e.reverse))
  }
}
