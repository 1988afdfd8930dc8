package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import org.apache.spark.unsafe.Platform

/** MinHash signature over a document's token stream (SURVEY.md §2.10
  * `llm_minhash`).
  *
  * k "permutations" are per-lane multiply-shift universal hashes over a
  * single 64-bit token digest: lane i ranks tokens by
  * (a_i·H(token) + b_i) >>> 32 with fixed odd 64-bit lane constants from
  * a seeded SplitMix64 stream. Each lane's ordering of the token
  * universe is scrambled independently (distinct multipliers), so
  * Pr[sig_a(i)=sig_b(i)] ≈ Jaccard with stddev sqrt(j(1-j)/k) —
  * property-tested against exact Jaccard in SketchSpec/PropertySpec.
  * Cost per token: one string hash + k multiply-adds, instead of k full
  * Murmur string walks. (A Kirsch–Mitzenmacher h1+i·h2 ladder was tried
  * and REJECTED: consecutive lanes share their argmin token, the band
  * S-curve collapses, and LSH candidates exploded 100× — lane
  * independence is load-bearing here.)
  *
  * Scale: this is the 100 TB near-dup path. The buffer is k ints per
  * group regardless of document size, `merge` is elementwise min
  * (associative + commutative → map-side partial aggregation works), and
  * downstream LSH banding turns the candidate search into an equi-join.
  * No RNG at runtime: everything is a pure function of the token bytes,
  * so results are reproducible across cluster runs and retries.
  */
class MinHashAgg(val k: Int = 128) extends Aggregator[String, Array[Int], Array[Int]] {
  // fixed per-lane constants from a seeded SplitMix64 stream (no runtime
  // RNG: same constants on every executor, run, and engine)
  private val (laneA, laneB) = {
    var x = 0x9e3779b97f4a7c15L
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (Array.fill(k)(next() | 1L), Array.fill(k)(next()))
  }

  // True 64-bit token digest (Spark's own XXH64, same function behind the
  // SQL xxhash64). A concat-of-two-32-bit-Murmur construction was used
  // before: its collision probability is governed by the weaker 32-bit
  // halves' correlation, and any digest collision identifies two tokens
  // in EVERY lane at once — at 10^10-distinct-token corpora that's a
  // handful of expected full-signature identifications. xxHash64's
  // 2^-64 collision model keeps that at ~0 (ADVICE r2).
  private def hash64(token: String): Long = {
    val b = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 0x9e3779b97f4a7c15L)
  }

  def zero: Array[Int] = Array.fill(k)(Int.MaxValue)

  def reduce(buf: Array[Int], token: String): Array[Int] = {
    val h = hash64(token)
    var i = 0
    while (i < k) {
      val v = ((laneA(i) * h + laneB(i)) >>> 32).toInt
      if (v < buf(i)) buf(i) = v
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
  * at 100 TB. Same determinism story as MinHash (seeded xxHash64, no
  * runtime RNG).
  */
class SimHashAgg extends Aggregator[String, Array[Int], Long] {
  def zero: Array[Int] = new Array[Int](64)

  // Same true-64-bit digest as MinHashAgg (distinct seed so the two
  // sketches' bit streams are independent).
  private def hash64(token: String): Long = {
    val b = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 0x51ed270b2545f491L)
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
