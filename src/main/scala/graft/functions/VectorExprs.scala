package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the vector hot path (SURVEY.md §4:
  * "first candidates if ever needed: … an Expression for fused
  * dot-product"). Profiling at sf0.1 showed the brute-force cosine/knn
  * queries spending ~60 s in interpreted `zip_with`/`aggregate` lambdas —
  * higher-order functions don't participate in whole-stage codegen. These
  * expressions generate a tight Java loop instead (~10× on the pair
  * stage), keeping the 4M-pair cross join compute-bound, not
  * interpreter-bound. Summation order is left-to-right, identical to the
  * lambda fold they replace, so oracle hash parity is unchanged.
  */

/** dot(a, b) over array<double> — fused multiply-add loop in codegen. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs are cast to array<double> by every caller (AbstractDataType /
  // ExpectsInputTypes are private[sql] in Spark 4, so no declared check)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // freshName: two instances can share a codegen scope (nullSafeCodeGen
      // emits no enclosing block when children are non-nullable) — fixed
      // names would collide and knock the stage back to interpreted eval
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
      |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
      |double $s = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  $s += $x.getDouble($i) * $y.getDouble($i);
      |}
      |${ev.value} = $s;
      |""".stripMargin
    })
}

/** adc(codes: array<int>, tab: array<array<bigint>>) — the PQ
  * asymmetric-distance sum: Σᵢ tab[i][codes[i]] over the M subspaces,
  * as one tight codegen loop. Replaces the `aggregate(sequence(0, M-1),
  * …)` higher-order-function form on the ADC scan (HOFs don't
  * participate in whole-stage codegen; at the ×30 ivfpq leg the
  * interpreted fold priced 2 B element_at evals). Exact integer adds in
  * subspace order — identical values to the HOF fold and to the
  * (sub, code)-join + sum form, so every ADC consumer stays
  * hash-comparable. Fail-loud on a code outside its table row: the
  * dense-codebook invariant is checked where indexes load
  * (PqIndex.search) and guaranteed where codebooks train (Pq.train seed
  * remap), but unsafe array access reads garbage instead of erroring,
  * so the loop keeps an explicit bounds check (one compare per element
  * next to a memory load). */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_adc"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tab = b.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), tab.numElements())
    var s = 0L
    var i = 0
    while (i < m) {
      val row = tab.getArray(i)
      val c = codes.getInt(i)
      if (c < 0 || c >= row.numElements())
        throw new ArrayIndexOutOfBoundsException(
          s"graft_adc: code $c outside table row of ${row.numElements()} (sub $i)")
      s += row.getLong(c)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, tab) => {
      val m = ctx.freshName("m"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
      |int $m = java.lang.Math.min($codes.numElements(), $tab.numElements());
      |long $s = 0L;
      |for (int $i = 0; $i < $m; $i++) {
      |  org.apache.spark.sql.catalyst.util.ArrayData $row = $tab.getArray($i);
      |  int $c = $codes.getInt($i);
      |  if ($c < 0 || $c >= $row.numElements())
      |    throw new ArrayIndexOutOfBoundsException(
      |      "graft_adc: code " + $c + " outside table row of " + $row.numElements());
      |  $s += $row.getLong($c);
      |}
      |${ev.value} = $s;
      |""".stripMargin
    })
}

/** agree(a, b) over array<int> — count of positions with equal values
  * (MinHash signature agreement). */
case class ArrayAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_agree"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAgreeCount =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getInt(i) == y.getInt(i)) c += 1; i += 1 }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
      s"""
      |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
      |int $c = 0;
      |for (int $i = 0; $i < $n; $i++) {
      |  if ($x.getInt($i) == $y.getInt($i)) $c++;
      |}
      |${ev.value} = $c;
      |""".stripMargin
    })
}

/** icount(a, b) over two SORTED, duplicate-free array<bigint> — the
  * intersection size by a single merge scan. Replaces
  * `size(array_intersect(a, b))` on the jaccard/containment scoring
  * path: ArrayIntersect builds a hash set AND materializes the
  * intersection array per row only for `size` to count it; on the
  * interned-long sorted sets (array_sort ∘ collect_set, so the input
  * contract holds by construction) a merge count is allocation-free
  * and branch-cheap. The count equals array_intersect's length exactly
  * when both inputs are sorted ascending with distinct elements —
  * callers outside that contract must keep array_intersect. */
case class SortedInterCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_icount"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedInterCount =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { c += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
      |int $na = $x.numElements();
      |int $nb = $y.numElements();
      |int $i = 0; int $j = 0; int $c = 0;
      |while ($i < $na && $j < $nb) {
      |  long $u = $x.getLong($i);
      |  long $v = $y.getLong($j);
      |  if ($u == $v) { $c++; $i++; $j++; }
      |  else if ($u < $v) { $i++; }
      |  else { $j++; }
      |}
      |${ev.value} = $c;
      |""".stripMargin
    })
}

/** emit_once(a, b, cur) over two SORTED, duplicate-free array<string>
  * or array<bigint> plus the current bucket key — true iff the MINIMUM
  * common element of the two arrays equals `cur`. The ShardedSelfJoin
  * emit-once test: a pair of docs sharing k blocking buckets is
  * generated in all k cells but must survive exactly the minimum one,
  * replacing the O(candidates) pair-dedup distinct. Has to be a
  * codegen'd merge scan: the `array_min(array_intersect(...)) = cur`
  * formulation is CodegenFallback in Spark and demotes the ENTIRE
  * candidate join stage to interpreted eval (measured 3× slower than
  * the distinct it replaced); this expression early-exits at the first
  * common element (sorted inputs make it the minimum) with zero
  * allocation. Element type is dispatched from the input schema and
  * CHECKED at analysis: the original string-only form read long arrays
  * through getUTF8String when round 7 first pointed minhash banding at
  * it — garbage comparisons, silently zero pairs (and slow). A typed
  * misuse must be an analysis error, never a wrong answer. */
case class EmitOnceMin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_emit_once"

  private lazy val elemType: DataType = first.dataType match {
    case org.apache.spark.sql.types.ArrayType(t, _) => t
    case _ => org.apache.spark.sql.types.NullType
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_emit_once expects (array<string>, array<string>, string) or " +
            s"(array<bigint>, array<bigint>, bigint), got ($a, $b, $c)")
    }
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): EmitOnceMin =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0
    if (elemType == org.apache.spark.sql.types.LongType) {
      val cur = c.asInstanceOf[Long]
      while (i < na && j < nb) {
        val u = x.getLong(i); val v = y.getLong(j)
        if (u == v) return u == cur
        else if (u < v) i += 1
        else j += 1
      }
    } else {
      val cur = c.asInstanceOf[UTF8String]
      while (i < na && j < nb) {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) return x.getUTF8String(i).equals(cur)
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    false
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, c) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val res = ctx.freshName("res")
      val body = if (elemType == org.apache.spark.sql.types.LongType) {
        val u = ctx.freshName("u"); val v = ctx.freshName("v")
        s"""
        |while ($i < $na && $j < $nb) {
        |  long $u = $x.getLong($i);
        |  long $v = $y.getLong($j);
        |  if ($u == $v) { $res = $u == $c; break; }
        |  else if ($u < $v) { $i++; }
        |  else { $j++; }
        |}
        |""".stripMargin
      } else {
        val cmp = ctx.freshName("cmp")
        s"""
        |while ($i < $na && $j < $nb) {
        |  int $cmp = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
        |  if ($cmp == 0) { $res = $x.getUTF8String($i).equals($c); break; }
        |  else if ($cmp < 0) { $i++; }
        |  else { $j++; }
        |}
        |""".stripMargin
      }
      s"""
      |int $na = $x.numElements();
      |int $nb = $y.numElements();
      |int $i = 0; int $j = 0;
      |boolean $res = false;
      |$body
      |${ev.value} = $res;
      |""".stripMargin
    })
}

/** graft_cms_est(sketch, key) — point-frequency estimate from a
  * serialized Count-Min sketch (the binary `count_min_sketch(...)`
  * aggregate and CmsMergeAgg produce). COLD-PATH decode by design: it
  * runs on post-aggregation frames of a few rows per version/probe key
  * (agg_cms_partial: ≤ versions × probe keys), never inside a per-row
  * hot loop, so it is a deliberate CodegenFallback — each eval re-reads
  * the ~eps⁻¹-column sketch, which would be the wrong trade anywhere
  * whole-stage codegen matters (contrast every expression above). The
  * estimate path hashes the key's UTF-8 bytes exactly as the SQL
  * aggregate's addBinary did, so estimates are consistent with how the
  * sketch was built (SketchSpec's est ≥ exact gate would catch any
  * divergence loudly — a mismatched hash reads ~0 for present keys). */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_cms_est"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            org.apache.spark.sql.types.StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cms_est expects (binary, string), got ($a, $b)")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    // the zero-length array is the merge Aggregators' identity (an
    // empty-corpus version): its population is empty, so every
    // estimate is 0 — readFrom would EOF on it
    if (bytes.isEmpty) return 0L
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    // byte[] dispatch: estimateCountForBinaryItem over the SAME UTF-8
    // bytes addBinary consumed — symmetric by construction, no
    // String-vs-UTF8String encoding question at all
    cms.estimateCount(key.asInstanceOf[UTF8String].getBytes)
  }
}

/** graft_bloom_might(sketch, key) — membership probe of a serialized
  * Bloom filter (BloomBuildAgg/BloomMergeAgg frames). Same cold-path
  * CodegenFallback posture as graft_cms_est: agg_bloom_partial probes a
  * FIXED ≤versions×probe-keys row set (each eval re-reads the ~117 KB
  * bitmap — never put this in a per-corpus-row loop; the
  * dedup-incremental scale path would instead broadcast ONE
  * deserialized filter per executor, a different mechanism). false =
  * definitely absent; true = present or an FP at the declared fpp. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            org.apache.spark.sql.types.LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_might expects (binary, bigint), got ($a, $b)")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    // zero-length = the merge identity (empty-corpus version): an
    // empty population contains nothing — definite absence, and
    // readFrom would EOF on it
    if (bytes.isEmpty) return false
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
      .mightContainLong(key.asInstanceOf[Long])
  }
}

/** graft_bloom_probe(sketch, key) — the HOT-PATH membership probe the
  * graft_bloom_might scaladoc points at ("the dedup-incremental scale
  * path would instead broadcast ONE deserialized filter per executor"):
  * the sketch side must be FOLDABLE (a literal — the driver-materialized
  * filter, bounded at the declared geometry size by construction), so
  * the bitmap is deserialized exactly once per JVM into a transient
  * lazy val and shipped to executors through the codegen references
  * array — per corpus row the generated code is one virtual
  * mightContainLong call inside whole-stage codegen, never a readFrom.
  * This mirrors how Spark's own runtime bloom-filter join evaluates its
  * pushed filter (a decode-once reference object over a constant
  * bloom), re-expressed here over the engine's BloomBuildAgg/
  * BloomMergeAgg sketch bytes so a delivery-version artifact can feed
  * it directly. Empty bytes = the merge identity (empty population):
  * constant false, definite absence. */
case class BloomProbe(sketch: Array[Byte], child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"
  override def nullable: Boolean = sketch == null || child.nullable

  // the bitmap is a CONSTRUCTOR FIELD, not a Literal child: a ~117 KB
  // binary literal would be hex-printed into every plan/explain string
  // (and checked byte-wise by every plan transform); as a field it
  // serializes with the expression exactly once and prints as a size.
  // Content-based equality (ADVICE r9): the case-class default compares
  // the Array[Byte] by reference, so two semantically identical probes
  // never compare equal — defeating expression canonicalization / CSE /
  // subexpression reuse. Arrays.equals/hashCode restore value semantics.
  override def equals(o: Any): Boolean = o match {
    case b: BloomProbe =>
      java.util.Arrays.equals(sketch, b.sketch) && child.equals(b.child)
    case _ => false
  }
  override def hashCode(): Int =
    31 * java.util.Arrays.hashCode(sketch) + child.hashCode()

  override def toString: String =
    s"graft_bloom_probe(sketch[${if (sketch == null) "null" else s"${sketch.length}B"}], $child)"
  override def sql: String = toString

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case a =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_probe expects a bigint key, got $a")
    }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)

  // decoded ONCE per JVM; null stands for "empty population" (empty
  // bytes — the merge Aggregators' identity) so eval never readFroms
  @transient private lazy val decoded: org.apache.spark.util.sketch.BloomFilter =
    if (sketch == null || sketch.isEmpty) null
    else org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(sketch))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    if (sketch == null) return null // null sketch → null verdict
    val k = child.eval(input)
    if (k == null) null
    else if (decoded == null) false // empty population contains nothing
    else decoded.mightContainLong(k.asInstanceOf[Long])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode, TrueLiteral}
    if (sketch == null) {
      ev.copy(isNull = TrueLiteral, value = JavaCode.defaultLiteral(dataType))
    } else if (decoded == null) {
      ev.copy(isNull = FalseLiteral, value = FalseLiteral)
    } else {
      // the deserialized filter rides the references array (Spark's
      // BloomFilterImpl is Serializable — the same mechanism the
      // built-in runtime-filter probe uses), so executors never decode
      val bf = ctx.addReferenceObj("graftBloomProbe", decoded,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      val k = child.genCode(ctx)
      ev.copy(code = code"""
        |${k.code}
        |boolean ${ev.isNull} = ${k.isNull};
        |boolean ${ev.value} = false;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $bf.mightContainLong(${k.value});
        |}
        |""".stripMargin)
    }
  }
}

object BloomProbe {
  /** Registry builder: the sketch argument must be a foldable binary
    * expression (a literal — the driver-materialized filter); it is
    * unwrapped to a field here so plans never carry a blob literal.
    * Per-row sketch COLUMNS are graft_bloom_might's job. */
  def fromArgs(exprs: Seq[Expression]): Expression = exprs(0) match {
    case sk if sk.foldable && sk.dataType == org.apache.spark.sql.types.BinaryType =>
      BloomProbe(sk.eval(null).asInstanceOf[Array[Byte]], exprs(1))
    case other =>
      throw new IllegalArgumentException(
        "graft_bloom_probe requires a FOLDABLE binary sketch (a literal) as " +
        s"its first argument, got $other — for per-row sketch columns use " +
        "graft_bloom_might")
  }
}

/** graft_pq_argmin(codebook, sub, sv, nsv) — nearest-centroid code for
  * one (vector, subspace) row, as a tight codegen loop over the DENSE
  * driver-local codebook (round 14). Replaces Pq.assign's broadcast-join
  * fan-out + min_by re-aggregation: that form pushed N·M·K rows through
  * a join and a two-phase aggregate (plus its ENSURE_REQUIREMENTS
  * exchange, since a localCheckpoint scan reports UnknownPartitioning)
  * only to pick one winner per input row — this expression scans the
  * same K centroids INSIDE the row, so the assign stage stays N·M rows
  * with no exchange and no aggregation at all.
  *
  * Value-identical to the join + min_by(struct(code, sv), struct(d2,
  * code)) form it replaces: the dot product is the same left-to-right
  * graft_dot loop over min(|sv|, |c|) elements; d2 = nsv − dot·2 + ncc
  * with the same association (ncc precomputed by the same loop on the
  * driver); the comparison is java.lang.Double.compare — exactly
  * Spark's SQLOrderingUtil.compareDoubles total order (−0.0 < 0.0, NaN
  * greatest) that min_by's struct ordering used — with ascending code
  * iteration and a strict `<` keeping the LOWEST code on d2 ties.
  *
  * The codebook rides the expression as a CONSTRUCTOR FIELD shipped via
  * the codegen references array (the graft_bloom_probe mechanism): the
  * registry builder consumes a FOLDABLE array<array<array<double>>>
  * literal indexed [sub][code] (Pq.train's dense-code invariant — the
  * same density PqIndex.search validates on load), so plans never carry
  * the ~M·K·sd-double literal. Fail-loud on a sub outside the codebook
  * (the graft_adc convention): a geometry mismatch must error, never
  * silently drop rows. */
case class PqArgmin(cb: Array[Array[Array[Double]]],
                    first: Expression, second: Expression, third: Expression,
                    round4: Boolean = false)
    extends TernaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String =
    if (round4) "graft_pq_argmin_r4" else "graft_pq_argmin"

  // ncc = dot(c, c) per [sub][code], precomputed once with graft_dot's
  // exact loop so d2 is bit-identical to the join form's ncc column
  @transient private lazy val ncc: Array[Array[Double]] =
    cb.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })

  // content-based equality (the BloomProbe note): the case-class default
  // compares the nested array by reference, defeating canonicalization
  override def equals(o: Any): Boolean = o match {
    case p: PqArgmin =>
      round4 == p.round4 &&
        java.util.Arrays.deepEquals(
          cb.asInstanceOf[Array[AnyRef]], p.cb.asInstanceOf[Array[AnyRef]]) &&
        first.equals(p.first) && second.equals(p.second) && third.equals(p.third)
    case _ => false
  }
  override def hashCode(): Int =
    (((java.util.Arrays.deepHashCode(cb.asInstanceOf[Array[AnyRef]]) * 31 +
      first.hashCode()) * 31 + second.hashCode()) * 31 + third.hashCode()) * 31 +
      round4.hashCode()

  override def toString: String =
    s"$prettyName(cb[${cb.length}x${cb.headOption.map(_.length).getOrElse(0)}], " +
      s"$first, $second, $third)"
  override def sql: String = toString

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType | LongType, ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_argmin expects (int sub, array<double> sv, double nsv), got ($a, $b, $c)")
    }
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqArgmin =
    copy(first = newFirst, second = newSecond, third = newThird)

  private def subIndex(sub: Any): Int = {
    val si = sub match {
      case i: Int  => i
      case l: Long => l.toInt
    }
    if (si < 0 || si >= cb.length)
      throw new ArrayIndexOutOfBoundsException(
        s"graft_pq_argmin: sub $si outside codebook of ${cb.length} subspaces")
    si
  }

  override def nullSafeEval(sub: Any, sv: Any, nsv: Any): Any = {
    val si = subIndex(sub)
    val x = sv.asInstanceOf[ArrayData]
    val nv = nsv.asInstanceOf[Double]
    val cs = cb(si); val ns = ncc(si)
    var best = -1; var bestD = 0.0
    var code = 0
    while (code < cs.length) {
      val c = cs(code)
      val n = math.min(x.numElements(), c.length)
      var dot = 0.0; var i = 0
      while (i < n) { dot += x.getDouble(i) * c(i); i += 1 }
      val raw = nv - dot * 2 + ns(code)
      // round4 replicates Det.r4 bit-for-bit: floor(x·10⁴ + 0.5) is
      // Spark's LONG-typed floor(double), the division re-widens —
      // kmeans ranks ROUNDED distances (ties broken by code at the
      // 1e-4 grain), pq ranks raw ones
      val d2 =
        if (round4) math.floor(raw * 10000 + 0.5).toLong.toDouble / 10000
        else raw
      if (best < 0 || java.lang.Double.compare(d2, bestD) < 0) {
        best = code; bestD = d2
      }
      code += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sub, sv, nsv) => {
      val cbRef = ctx.addReferenceObj("graftPqCb", cb, "double[][][]")
      val nccRef = ctx.addReferenceObj("graftPqNcc", ncc, "double[][]")
      val si = ctx.freshName("si"); val cs = ctx.freshName("cs")
      val ns = ctx.freshName("ns"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val code = ctx.freshName("code")
      val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      val d2 = ctx.freshName("d2")
      val d2Expr =
        if (round4)
          s"((double) (long) java.lang.Math.floor(($nsv - $dot * 2 + $ns[$code]) * 10000 + 0.5)) / 10000"
        else s"$nsv - $dot * 2 + $ns[$code]"
      s"""
      |int $si = (int) $sub;
      |if ($si < 0 || $si >= $cbRef.length)
      |  throw new ArrayIndexOutOfBoundsException(
      |    "$prettyName: sub " + $si + " outside codebook of " + $cbRef.length + " subspaces");
      |double[][] $cs = $cbRef[$si];
      |double[] $ns = $nccRef[$si];
      |int $best = -1; double $bestD = 0.0;
      |for (int $code = 0; $code < $cs.length; $code++) {
      |  double[] $c = $cs[$code];
      |  int $n = java.lang.Math.min($sv.numElements(), $c.length);
      |  double $dot = 0.0;
      |  for (int $i = 0; $i < $n; $i++) { $dot += $sv.getDouble($i) * $c[$i]; }
      |  double $d2 = $d2Expr;
      |  if ($best < 0 || java.lang.Double.compare($d2, $bestD) < 0) {
      |    $best = $code; $bestD = $d2;
      |  }
      |}
      |${ev.value} = $best;
      |""".stripMargin
    })
}

object PqArgmin {
  /** Shared builder guts: unwrap a FOLDABLE array<array<array<double>>>
    * codebook literal into plain Java arrays so plans never carry the
    * blob literal. */
  private[functions] def unwrapCb(name: String, ce: Expression): Array[Array[Array[Double]]] =
    ce match {
      case c if c.foldable && (c.dataType match {
            case org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.ArrayType(DoubleType, _), _), _) => true
            case _ => false
          }) =>
        val outer = c.eval(null).asInstanceOf[ArrayData]
        Array.tabulate(outer.numElements()) { s =>
          val mid = outer.getArray(s)
          Array.tabulate(mid.numElements())(k => mid.getArray(k).toDoubleArray())
        }
      case other =>
        throw new IllegalArgumentException(
          s"$name requires a FOLDABLE array<array<array<double>>> codebook " +
            s"(a literal) as its first argument, got $other")
    }

  /** Registry builder: codebook indexed [sub][code], dense codes —
    * Pq.train's invariant. */
  def fromArgs(exprs: Seq[Expression]): Expression =
    PqArgmin(unwrapCb("graft_pq_argmin", exprs(0)), exprs(1), exprs(2), exprs(3))

  /** The r4-ranked variant (llm_kmeans: distances are rounded to the
    * 1e-4 grain BEFORE the (d², code) argmin — the cross-engine tie
    * discipline). */
  def fromArgsR4(exprs: Seq[Expression]): Expression =
    PqArgmin(unwrapCb("graft_pq_argmin_r4", exprs(0)), exprs(1), exprs(2), exprs(3),
      round4 = true)
}

/** graft_pq_dists(codebook, sub, sv, nsv) — the per-(query, subspace)
  * ADC partial-distance ROW: array<long> indexed by code with
  * p9[code] = floor((nsv − dot(sv, c)·2 + ncc)·1e9 + 0.5), the exact
  * integers Pq.queryTables produced via its broadcast-join fan-out
  * (identical IEEE expression per element; code-ascending order is the
  * sort_array(struct(code, p9)) order packQueryTables imposed). Same
  * round-14 rationale as graft_pq_argmin: the join form fanned every
  * (query, subspace) row out ×K and re-aggregated it back into this
  * very array — in-row generation keeps the stage at N·M rows with no
  * join and no pack aggregation, which also removes the one corpus-wide
  * fan-out the pq candidate mode still had. Codebook rides the
  * references array (never a plan literal); fail-loud on sub mismatch. */
case class PqDistRow(cb: Array[Array[Array[Double]]],
                     first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "graft_pq_dists"

  @transient private lazy val ncc: Array[Array[Double]] =
    cb.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })

  override def equals(o: Any): Boolean = o match {
    case p: PqDistRow =>
      java.util.Arrays.deepEquals(
        cb.asInstanceOf[Array[AnyRef]], p.cb.asInstanceOf[Array[AnyRef]]) &&
        first.equals(p.first) && second.equals(p.second) && third.equals(p.third)
    case _ => false
  }
  override def hashCode(): Int =
    ((java.util.Arrays.deepHashCode(cb.asInstanceOf[Array[AnyRef]]) * 31 +
      first.hashCode()) * 31 + second.hashCode()) * 31 + third.hashCode()

  override def toString: String =
    s"graft_pq_dists(cb[${cb.length}x${cb.headOption.map(_.length).getOrElse(0)}], " +
      s"$first, $second, $third)"
  override def sql: String = toString

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType | LongType, ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_dists expects (int sub, array<double> sv, double nsv), got ($a, $b, $c)")
    }
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqDistRow =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def nullSafeEval(sub: Any, sv: Any, nsv: Any): Any = {
    val si = sub match { case i: Int => i; case l: Long => l.toInt }
    if (si < 0 || si >= cb.length)
      throw new ArrayIndexOutOfBoundsException(
        s"graft_pq_dists: sub $si outside codebook of ${cb.length} subspaces")
    val x = sv.asInstanceOf[ArrayData]
    val nv = nsv.asInstanceOf[Double]
    val cs = cb(si); val ns = ncc(si)
    val out = new Array[Long](cs.length)
    var code = 0
    while (code < cs.length) {
      val c = cs(code)
      val n = math.min(x.numElements(), c.length)
      var dot = 0.0; var i = 0
      while (i < n) { dot += x.getDouble(i) * c(i); i += 1 }
      out(code) = math.floor((nv - dot * 2 + ns(code)) * 1e9 + 0.5).toLong
      code += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sub, sv, nsv) => {
      val cbRef = ctx.addReferenceObj("graftPqCb", cb, "double[][][]")
      val nccRef = ctx.addReferenceObj("graftPqNcc", ncc, "double[][]")
      val si = ctx.freshName("si"); val cs = ctx.freshName("cs")
      val ns = ctx.freshName("ns"); val out = ctx.freshName("out")
      val code = ctx.freshName("code"); val c = ctx.freshName("c")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
      |int $si = (int) $sub;
      |if ($si < 0 || $si >= $cbRef.length)
      |  throw new ArrayIndexOutOfBoundsException(
      |    "graft_pq_dists: sub " + $si + " outside codebook of " + $cbRef.length + " subspaces");
      |double[][] $cs = $cbRef[$si];
      |double[] $ns = $nccRef[$si];
      |long[] $out = new long[$cs.length];
      |for (int $code = 0; $code < $cs.length; $code++) {
      |  double[] $c = $cs[$code];
      |  int $n = java.lang.Math.min($sv.numElements(), $c.length);
      |  double $dot = 0.0;
      |  for (int $i = 0; $i < $n; $i++) { $dot += $sv.getDouble($i) * $c[$i]; }
      |  $out[$code] = (long) java.lang.Math.floor(($nsv - $dot * 2 + $ns[$code]) * 1e9 + 0.5);
      |}
      |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
      |""".stripMargin
    })
}

object PqDistRow {
  def fromArgs(exprs: Seq[Expression]): Expression =
    PqDistRow(PqArgmin.unwrapCb("graft_pq_dists", exprs(0)),
      exprs(1), exprs(2), exprs(3))
}

/** Session-scoped registration so query bodies can use the expressions
  * via `expr("graft_dot(a, b)")` — the Spark-4-safe way to build a
  * Column from a custom Expression. Idempotent. The function table is
  * shared with GraftExtensions (the `spark.sql.extensions` cluster path)
  * so both registration routes always expose the same surface. */
object VectorExprs {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder(_), "built-in")
    }
  }
}
