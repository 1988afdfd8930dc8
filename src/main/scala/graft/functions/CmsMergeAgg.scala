package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.CountMinSketch

/** Union of serialized Count-Min sketches (the binary frames Spark's
  * `count_min_sketch(...)` aggregate produces) — the capability the
  * built-in aggregate doesn't expose: it can BUILD a sketch from raw
  * rows but cannot MERGE already-built sketches, which is the whole
  * point of a CMS in an incremental-delivery pipeline (each daily
  * delivery ships its KB-size frequency state; any cross-version count
  * is a union of sketches, never a re-scan — the frequency twin of
  * agg_hll_partial's hll_union_agg).
  *
  * Mergeability requires identical (depth, width, seed) on every input
  * — guaranteed when all sketches come from the same
  * `count_min_sketch(col, eps, confidence, seed)` literal, as
  * agg_cms_partial's do; CountMinSketch.mergeInPlace throws loudly
  * ("Cannot merge") on a mismatch rather than merging garbage. The
  * empty array is the identity (zero sketch), so empty groups and the
  * Aggregator's zero compose correctly. Buffer cost: one
  * deserialize/merge/serialize per input sketch over ~eps⁻¹·depth
  * longs — this aggregates a few KB-to-100KB rows per VERSION, never
  * per corpus row. */
class CmsMergeAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  private def read(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(b))
  private def write(s: CountMinSketch): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    s.writeTo(o)
    o.toByteArray
  }

  override def zero: Array[Byte] = Array.empty[Byte]

  override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = merge(buf, in)

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a == null || a.isEmpty) b
    else if (b == null || b.isEmpty) a
    else {
      val s = read(a)
      s.mergeInPlace(read(b))
      write(s)
    }

  override def finish(r: Array[Byte]): Array[Byte] = r

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
