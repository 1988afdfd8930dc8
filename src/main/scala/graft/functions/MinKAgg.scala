package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded bottom-k selection under the total order (df ASC, token ASC) —
  * the aggregate form of `row_number().over(partitionBy(doc).orderBy(df,
  * token)) <= k` that the rarity-blocking stages (jaccard's 4-rarest-token
  * blocks, containment's (nt div 10 + 1)-token probe prefix) used to
  * express as a ranking window.
  *
  * Why an Aggregator and not the window (VERDICT r6 #3): the window form
  * SHUFFLES and SORTS the entire distinct token stream — O(corpus tokens)
  * rows moved and ordered so that ≤k rows per doc survive the rn filter.
  * At 100 TB that sort dominates the whole pair pipeline. The Aggregator
  * gets map-side partial aggregation: each input partition reduces to one
  * ≤k-element buffer per doc before the exchange, so the shuffle moves
  * O(docs · partitions · k) bounded buffers — the selection result, not
  * the token stream. Same trick, same justification as TopKAgg for the
  * cosine family.
  *
  * k arrives as the third INPUT column (not a constructor argument)
  * because containment's prefix size varies per doc — `(nt div 10) + 1`,
  * a pure function of the doc's token count. Contract: k must be CONSTANT
  * within each group (it derives from group-functionally-dependent
  * columns; jaccard passes lit(4)). merge() takes max(ka, kb) so a
  * not-yet-initialized buffer (k=0, from an empty partition) never
  * truncates a warm one.
  *
  * Determinism: tokens are DISTINCT per doc (the stream is
  * tokens().distinct()), so (df, token) is a strict total order within a
  * group and the selected k-set plus its order are a pure function of the
  * input multiset — reduce/merge order cannot change the result. The
  * output is the token list in (df, token) rank order; callers explode it
  * back to rows, which restores exactly the rows the window form kept.
  *
  * Buffer ops mirror TopKAgg: reject-above-the-cut is O(1) against the
  * current k-th element; accepted rows pay an O(k) insertion.
  */
class MinKAgg
    extends Aggregator[(Long, String, Int),
                       (Int, Seq[(Long, String)]),
                       Seq[String]] {

  // "a ranks strictly before b" under (df asc, token asc)
  private def before(a: (Long, String), b: (Long, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  def zero: (Int, Seq[(Long, String)]) = (0, Vector.empty)

  def reduce(buf: (Int, Seq[(Long, String)]), x: (Long, String, Int)): (Int, Seq[(Long, String)]) = {
    val k = math.max(buf._1, x._3)
    val e = (x._1, x._2)
    val b = buf._2
    if (b.size >= k && b.nonEmpty && before(b.last, e)) (k, b) // above the cut: O(1) reject
    else {
      val i = b.indexWhere(o => before(e, o))
      val ins = if (i < 0) b :+ e else (b.take(i) :+ e) ++ b.drop(i)
      (k, if (ins.size > k) ins.take(k) else ins)
    }
  }

  def merge(a: (Int, Seq[(Long, String)]), b: (Int, Seq[(Long, String)])): (Int, Seq[(Long, String)]) = {
    val k = math.max(a._1, b._1)
    b._2.foldLeft((k, a._2)) { case ((kk, acc), e) => reduce((kk, acc), (e._1, e._2, kk)) }
  }

  def finish(buf: (Int, Seq[(Long, String)])): Seq[String] = buf._2.map(_._2)

  def bufferEncoder: Encoder[(Int, Seq[(Long, String)])] =
    ExpressionEncoder[(Int, Seq[(Long, String)])]()
  def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}
