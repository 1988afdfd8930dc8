package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Shared IVF sign-bucket coarse quantizer — ONE construction used by
  * the whole ANN family: llm_ann_ivf / llm_embed_neardup / llm_semdedup
  * (Extras) and, since round 10, the conf-switched candidate generator
  * behind the dense top-k retrieval family (Llm.densePairs). Sharing the
  * construction is the Sketches.Pq precedent: the recall pins
  * (AnnRecallSpec) then speak for every consumer, not just the query
  * they were measured on. */
private[graft] object Ann {

  /** IVF coarse-quantizer width in sign bits (2^bits cells), the
    * bits ↔ candidates ↔ recall knob: raise it with the corpus so
    * cell occupancy (N/2^bits) stays near the target candidate budget.
    * The DEFAULT (3 bits, hyperplane dims 1/9/17) is the declared
    * oracle contract — the SQL mirror hardcodes it — so overriding
    * spark.graft.ann.bits departs from the oracle; AnnRecallSpec
    * re-pins the recall floor at 4 bits. Capped by the fixture's
    * embedding dim (hyperplane k reads dim 8k+1). */
  def annBits(s: org.apache.spark.sql.SparkSession): Int = {
    val b = s.conf.get("spark.graft.ann.bits", "3").toInt
    // 16-bit ceiling = 65 536 cells: the probe-cell unions that collect
    // driver-side (PqIndex.search partition pruning) stay ≤ 256 KB of
    // ints, and probeMasks at radius 2 stays ≤ 137 rows per query. The
    // binding constraint in practice is the EMBEDDING DIM, not this
    // ceiling — cellExpr's hyperplane k reads dim 8k+1, so 64-d
    // fixtures top out at 8 bits while a 768-d production corpus can
    // carry the full 16 (the round-10 VectorScale A/B measured ivf's
    // ×30 candidate growth cap-bound at 8 bits on the 64-d fixture).
    require(b >= 1 && b <= 16, s"spark.graft.ann.bits must be in [1, 16], got $b")
    b
  }

  /** Multi-probe Hamming radius: 1 (default — the declared oracle
    * contract for llm_ann_ivf) probes the query's own cell plus its
    * `bits` one-bit neighbours; 2 adds the bits·(bits−1)/2 two-bit
    * neighbours — the recall ↔ candidates dial the dense top-k family's
    * ivf candidate mode turns (radius 2 at 8 bits is 37/256 cells ≈ 14%
    * of the corpus for ~0.9+ recall on even near-orthogonal vectors). */
  def probeRadius(s: org.apache.spark.sql.SparkSession): Int = {
    val r = s.conf.get("spark.graft.ann.probeRadius", "1").toInt
    require(r >= 0 && r <= 2, s"spark.graft.ann.probeRadius must be in [0, 2], got $r")
    r
  }

  /** The coarse-quantizer cell of an `e: array<double>` column — the ONE
    * sign-bucket expression every consumer (query family and the PqIndex
    * IVF+PQ artifact) computes, so a cell id means the same thing
    * everywhere. Hyperplane k reads dim 8k+1, so `bits` needs embedding
    * dim ≥ 8·(bits−1)+1. Without the guard an out-of-range element_at
    * turns the cell NULL (ANSI off) and the probe equi-join silently
    * returns a near-empty ANN result instead of erroring (ADVICE r5).
    * The guard is a codegen'd per-row 0 added into the cell that raises
    * on the first too-short vector — no plan-build-time probe job. */
  def cellExpr(bits: Int): org.apache.spark.sql.Column = {
    val need = 8 * (bits - 1) + 1
    val dimGuard = when(size(col("e")) >= need, lit(0)).otherwise(
      raise_error(concat(
        lit(s"ann cell of $bits bits needs embedding dim >= $need, got "),
        size(col("e")).cast("string"))).cast("int"))
    dimGuard + (0 until bits).map(i =>
      (element_at(col("e"), i * 8 + 1) > 0).cast("int") * lit(1 << (bits - 1 - i)))
      .reduce(_ + _)
  }

  /** The multi-probe XOR masks for Hamming≤radius probing. Distinct by
    * construction, so each (query cell, candidate cell) pair matches at
    * most one mask — probing stays an EQUI-join with no dedup. */
  def probeMasks(bits: Int, radius: Int): Seq[Int] =
    Seq(0) ++
      (if (radius >= 1) (0 until bits).map(1 << _) else Seq.empty) ++
      (if (radius >= 2)
        for (i <- 0 until bits; j <- (i + 1) until bits) yield (1 << i) | (1 << j)
      else Seq.empty)

  def bucketed(s: org.apache.spark.sql.SparkSession, d: String) = {
    graft.functions.VectorExprs.register(s)
    val bits = annBits(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(expr("graft_dot(e, e)")))
      .withColumn("bkt", cellExpr(bits))
  }

  /** Hamming≤radius multi-probe: the query's own cell plus every cell
    * within `probeRadius` bit flips. The XOR masks are distinct, so each
    * (query, candidate) cell pair matches at most one probe — no dedup
    * is needed and the probe join stays an EQUI-join. Recall on
    * near-orthogonal fixture vectors ≈ Σ survival over ≤radius bit
    * flips (AnnRecallSpec pins the measured floors); candidates stay
    * ~nprobe/cells of N² — at real scale raise the bit count with the
    * corpus and keep nprobe fixed. */
  def withProbes(s: org.apache.spark.sql.SparkSession,
                 v: org.apache.spark.sql.DataFrame) = {
    val bits = annBits(s)
    val masks = probeMasks(bits, probeRadius(s))
    val probes = masks.map(m => if (m == 0) "bkt" else s"bkt ^ $m")
      .mkString("array(", ", ", ")")
    v.withColumn("probe", explode(expr(probes)))
  }
}
