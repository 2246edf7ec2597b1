package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory grouped top-k via a typed [[Aggregator]].
  *
  * The window formulation (row_number over partitionBy ≤ k) sorts every
  * group in full before discarding all but k rows; this aggregator's
  * buffer IS the running top-k (a k-bounded ordered list), so map-side
  * partial aggregation prunes to k entries per group per partition before
  * the shuffle — O(n log k) work, O(groups·k) shuffle bytes, no full sort
  * anywhere. The shape that survives a 100× group-size scale-up.
  *
  * Also the library's typed-API exemplar: case-class rows, Encoders, and
  * a custom Aggregator composing with groupByKey/agg like any builtin.
  */
object TypedTopK {
  /** One ranked entry: ordered by score desc, then id asc (total order). */
  case class Entry(score: Double, id: Long)

  class TopKAgg(k: Int) extends Aggregator[Entry, List[Entry], List[Entry]] {
    require(k >= 1)
    private def beats(a: Entry, b: Entry): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: List[Entry] = Nil
    override def reduce(buf: List[Entry], e: Entry): List[Entry] = insert(buf, e)
    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)(insert)
    override def finish(r: List[Entry]): List[Entry] = r
    override def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[List[Entry]] = ExpressionEncoder()

    private def insert(buf: List[Entry], e: Entry): List[Entry] = {
      if (buf.lengthCompare(k) >= 0 && beats(buf.last, e)) buf // common case: below the bar
      else {
        val (pre, post) = buf.span(x => beats(x, e))
        (pre ::: e :: post).take(k)
      }
    }
  }

  /** Top-k entries per key: (key, id, score, rnk 1..k). */
  def topKPerKey(rows: Dataset[(Long, Entry)], k: Int): Dataset[(Long, Long, Double, Long)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopKAgg(k).toColumn.name("topk"))
      .flatMap { case (key, entries) =>
        entries.iterator.zipWithIndex.map { case (e, i) =>
          (key, e.id, e.score, (i + 1).toLong)
        }
      }
  }
}
