package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import scala.util.hashing.MurmurHash3

/** MinHash signature over a document's token stream (SURVEY.md §2.10
  * `llm_minhash`).
  *
  * k independent permutations are simulated with seeded MurmurHash3
  * (seed = golden-ratio constant + i): signature(i) = min over tokens of
  * h_i(token). Pr[sig_a(i) == sig_b(i)] = Jaccard(A, B), so position-wise
  * agreement estimates Jaccard with stddev sqrt(j(1-j)/k) (≈0.04 at
  * k=128) — property-tested against the exact Jaccard in MinHashSpec.
  *
  * Scale: this is the 100 TB near-dup path. The buffer is k ints per
  * group regardless of document size, `merge` is elementwise min
  * (associative + commutative → map-side partial aggregation works), and
  * downstream LSH banding turns the candidate search into an equi-join.
  * No RNG at runtime: everything is a pure function of the token bytes,
  * so results are reproducible across cluster runs and retries.
  */
class MinHashAgg(val k: Int = 128) extends Aggregator[String, Array[Int], Array[Int]] {
  def zero: Array[Int] = Array.fill(k)(Int.MaxValue)

  def reduce(buf: Array[Int], token: String): Array[Int] = {
    var i = 0
    while (i < k) {
      val h = MurmurHash3.stringHash(token, 0x9e3779b9 + i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  def finish(buf: Array[Int]): Array[Int] = buf

  def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  def outputEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
}

/** 64-bit SimHash (SURVEY.md §2.10 `llm_simhash`): each token votes ±1 on
  * every bit position of its 64-bit hash; the signature keeps the sign of
  * each tally. Near-identical token sets differ in few bits, so Hamming
  * distance on the fixed-width signature is the dedup metric — and the
  * signature is a single BIGINT column, the cheapest possible shuffle key
  * at 100 TB. Same determinism story as MinHash (seeded MurmurHash3, no
  * runtime RNG).
  */
class SimHashAgg extends Aggregator[String, Array[Int], Long] {
  def zero: Array[Int] = new Array[Int](64)

  private def hash64(token: String): Long = {
    val hi = MurmurHash3.stringHash(token, 0x51ed270b)
    val lo = MurmurHash3.stringHash(token, 0x2545f491)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  def reduce(buf: Array[Int], token: String): Array[Int] = {
    val h = hash64(token)
    var j = 0
    while (j < 64) {
      buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
      j += 1
    }
    buf
  }

  def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  def finish(buf: Array[Int]): Long = {
    var sig = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
}
