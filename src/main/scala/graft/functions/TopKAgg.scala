package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded top-k selection under the total order (score DESC, id ASC) —
  * the aggregate form of `row_number().over(partitionBy(g).orderBy(score
  * desc, id)) <= k` for the brute-force neighbour queries
  * (`llm_cosine_topk` / `llm_knn_label`).
  *
  * Why an Aggregator and not the window: the window formulation must
  * SHUFFLE every candidate row (4M at sf0.1: the full cross-join output)
  * to its group's task and sort it there, k=5 of which survive. An
  * Aggregator gets map-side partial aggregation: each input partition
  * reduces to one ≤k-element buffer per group before the exchange, so
  * the shuffle moves O(groups · partitions · k) bounded buffers instead
  * of O(candidates) rows — at 100 TB the difference between shuffling
  * the candidate set and shuffling the answer.
  *
  * Determinism: the per-group id is unique, so (score, id) is a strict
  * total order and the selected k-set plus its order are a pure function
  * of the input multiset — reduce/merge order cannot change the result
  * (same argument as MinHashAgg's elementwise min). Callers must pass
  * the SAME rounded score they would have windowed on (r4 before, not
  * after, selection).
  *
  * Buffer ops: reject-below-the-cut is O(1) (compare against the current
  * k-th element); accepted rows pay an O(k) insertion — after the buffer
  * warms, almost every row takes the O(1) path.
  */
class TopKAgg(val k: Int = 5)
    extends Aggregator[(Double, Long, Long),
                       Seq[(Double, Long, Long)],
                       Seq[(Double, Long, Long)]] {

  // "a ranks strictly before b" under (score desc, id asc).
  // Double.compare, not primitive '>': a NaN score (zero-norm vector at
  // web scale) must rank as the LARGEST value — the order Spark's
  // descending sort and DuckDB's ORDER BY both use — where primitive
  // comparisons are all-false on NaN and would let merge order pick the
  // winner. r4 never emits -0.0 (floor(±0+0.5)/10⁴ = +0.0), so the
  // -0.0 < +0.0 distinction Double.compare adds is unreachable.
  private def before(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  def zero: Seq[(Double, Long, Long)] = Vector.empty

  def reduce(buf: Seq[(Double, Long, Long)], x: (Double, Long, Long)): Seq[(Double, Long, Long)] =
    if (buf.size >= k && before(buf.last, x)) buf // below the cut: O(1) reject
    else {
      val i = buf.indexWhere(e => before(x, e))
      val ins = if (i < 0) buf :+ x else (buf.take(i) :+ x) ++ buf.drop(i)
      if (ins.size > k) ins.take(k) else ins
    }

  def merge(a: Seq[(Double, Long, Long)], b: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] =
    b.foldLeft(a)(reduce)

  def finish(buf: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = buf

  def bufferEncoder: Encoder[Seq[(Double, Long, Long)]] =
    ExpressionEncoder[Seq[(Double, Long, Long)]]()
  def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
    ExpressionEncoder[Seq[(Double, Long, Long)]]()
}
