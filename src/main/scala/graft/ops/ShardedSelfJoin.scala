package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe all-pairs self-join within LSH buckets (VERDICT r3 #8).
  *
  * The band joins in Sketches generate candidates by self-joining the
  * banded frame on (band, bkey, lang). At web scale one pathological
  * bucket — thousands of boilerplate-identical documents landing in the
  * same (band, bkey) — would put the whole bucket in ONE task and
  * produce |B|² pairs from it, exceeding task memory long before the
  * shuffle does. This helper shards oversized buckets with the
  * triangle-cell decomposition for symmetric self-joins:
  *
  *   S = ceil(|bucket| / threshold) shards; row shard s = hash(doc_id) mod S.
  *   Left side replicates to cells (p=s, q) for q ∈ [s, S);
  *   right side to cells (p, q=s) for p ∈ [0, s].
  *   Join key = bucket key ++ (p, q).
  *
  * A pair with shards (sx ≤ sy) meets in exactly cell (sx, sy), so the
  * pair set is IDENTICAL to the naive self-join (SkewSpec pins this),
  * while per-task input is bounded by ~2·threshold rows per cell and a
  * hot bucket fans out over S(S+1)/2 independent tasks. Buckets at or
  * under the threshold get S=1 → single cell (0,0) → exactly the
  * original join, so the normal path pays only the oversized-bucket
  * broadcast annotation (no extra shuffle).
  *
  * Escalation note: sharding bounds task INPUT, not pair OUTPUT — a
  * bucket of B rows still owes B²/2 pairs, just spread fairly. For a
  * truly degenerate bucket (millions of byte-identical boilerplate
  * docs) the right move is upstream of this join: exact-dedup first
  * (llm_exact_dedup collapses identical texts to one representative),
  * or cap the bucket to a representative sample — a semantics change
  * that needs a per-pipeline decision, not a silent default here.
  */
object ShardedSelfJoin {

  /** Shared shard-size knob for every blocking/banding self-join (LSH
    * bands, rarity blocks, min-shingle blocks). 64k narrow rows per cell
    * side keeps a task's join buffer in the tens of MB. */
  def confThreshold(s: org.apache.spark.sql.SparkSession): Int =
    s.conf.get("spark.graft.lsh.shardThreshold", "65536").toInt

  /** All unordered candidate pairs (doc_a < doc_b) within each bucket.
    *
    * @param banded    one row per (doc, bucket) with a `doc_id` column
    * @param keys      bucket key columns (e.g. band, bkey, lang)
    * @param threshold max bucket rows a single task should hold; buckets
    *                  beyond it are sharded into ceil(size/threshold)
    * @param carry     extra per-doc columns to surface as {c}_a / {c}_b
    * @param pairFilter optional predicate applied BEFORE the dedup
    *                  `distinct`, so pairs a caller will discard anyway
    *                  (e.g. old-old pairs in an incremental dedup) never
    *                  pay the distinct shuffle. The expression resolves
    *                  against the OUTPUT columns: doc_a, doc_b and the
    *                  normalized carries ({c}_a / {c}_b)
    * @param emitOnce  optional (keyCol, setCol): each banded row carries
    *                  in setCol the SORTED array of ALL its bucket keys
    *                  for keyCol (e.g. a doc's 4 block tokens). A pair is
    *                  then kept only in the cell whose key is the MINIMUM
    *                  element of the two sets' intersection — a pair
    *                  sharing k buckets is generated in all k but
    *                  SURVIVES exactly one, so the O(candidates) dedup
    *                  `distinct` shuffle is skipped entirely (the
    *                  AllPairs/PPJoin emit-once discipline, relational).
    *                  Requires every key of a row's bucket to appear in
    *                  its setCol; the min is on the column's own type
    *                  ordering (strings lexicographic) — exact, no
    *                  hashing. PropertySpec pins ≡ the distinct path on
    *                  random multi-bucket layouts. History: round 6
    *                  measured this NEGATIVE for the rarity path because
    *                  the scan then ran before the prefilter, taxing
    *                  every raw candidate; round 8 moved the scan after
    *                  pairFilter (see the ordering note in the body) and
    *                  the same path now wins 1.2 s vs 2.7–3.0 s, so
    *                  every blocking/banding caller uses emit-once.
    *                  Contract enforcement (ADVICE r6): correctness with
    *                  emit-once rests entirely on the caller keeping
    *                  setCol sorted, duplicate-free and containing the
    *                  row's own keyCol — a violation would silently
    *                  duplicate or drop pairs (no distinct backstop).
    *                  `spark.graft.lsh.emitOnce.validate` (default true)
    *                  therefore raise_error()s on the first violating
    *                  INPUT row. Cost note: the validating filter sits on
    *                  the banded frame, which this join references THREE
    *                  times (oversize census + both sides), so the check
    *                  evaluates up to 3× per banded row — still O(rows·k)
    *                  against the O(candidates) join it guards, but the
    *                  constant is 3, which is the measured ~1.2 s on the
    *                  minhash banding. Droppable by conf on a validated
    *                  production path.
    * @param emitOnceByConstruction caller's assertion that setCol is
    *                  sorted/duplicate-free/self-containing BY
    *                  CONSTRUCTION in the lines building it (e.g.
    *                  sort_array over an injective encoding with keyCol
    *                  exploded from the same array) — skips the per-row
    *                  validation, which would re-check a structural
    *                  invariant at data cost (measured 1.2 s of the
    *                  minhash banding's 3.5 s). Data-derived setCols
    *                  must NOT set this; the conf still force-disables
    *                  globally.
    */
  /** @param uniqueMembership caller's assertion that every row appears
    *                  in exactly ONE bucket (a partitioning coarse
    *                  quantizer like an IVF cell — unlike multi-band
    *                  LSH or multi-token blocking). Each unordered pair
    *                  then meets in exactly one bucket, hence exactly
    *                  one triangle cell, so the candidate stream is
    *                  duplicate-free by construction and BOTH dedup
    *                  mechanisms (emit-once scan, distinct shuffle) are
    *                  skipped. Asserting it on multi-bucket data would
    *                  silently duplicate pairs; SkewSpec pins the
    *                  semdedup caller's pair set against the naive join.
    */
  /** @param pinWidth  exempt this join's two input exchanges from AQE
    *                  size-based coalescing (see the width-pin note in
    *                  the body). Default true — the pair family's
    *                  candidate joins fan out quadratically per cell and
    *                  AQE under-parallelizes them by pricing input bytes.
    *                  Callers whose candidate volume is SMALL BY
    *                  CONSTRUCTION (tight blocking recall, or heavy
    *                  carried payloads that would ride the extra
    *                  exchange) opt out and keep the coalesced plan:
    *                  measured +0.45 s on llm_ngram_jaccard and +0.10 s
    *                  on llm_semdedup with the pin vs without, against
    *                  −1.0..−2.0 s per query on the high-volume callers.
    */
  def pairs(banded: DataFrame, keys: Seq[String], threshold: Int,
            carry: Seq[String] = Nil,
            pairFilter: Option[org.apache.spark.sql.Column] = None,
            emitOnce: Option[(String, String)] = None,
            emitOnceByConstruction: Boolean = false,
            uniqueMembership: Boolean = false,
            pinWidth: Boolean = true): DataFrame = {
    require(threshold > 0, "shard threshold must be positive")
    // uniqueMembership audit (ADVICE r9): unlike emitOnce — whose
    // contract has conf-gated raise_error validation — this assertion
    // had NO backstop: a caller passing multi-bucket data silently
    // duplicates pairs. Under an EXPLICIT spark.graft.lsh.emitOnce
    // .validate=true (the same audit switch; never on by default here
    // because every current caller is unique-by-construction via a
    // partitioning quantizer, and the check costs a window shuffle of
    // the banded frame), count bucket multiplicity per doc and
    // raise_error on the first doc appearing under more than one key
    // tuple. PropertySpec pins that the audit fires on multi-bucket
    // input and passes on partitioned input.
    val bandedU =
      if (uniqueMembership && banded.sparkSession.conf
            .getOption("spark.graft.lsh.emitOnce.validate").exists(_.toBoolean)) {
        val w = Window.partitionBy(col("doc_id"))
        banded.withColumn("__um_n", count(lit(1)).over(w))
          .where(when(col("__um_n") === 1, lit(true))
            .otherwise(raise_error(concat(
              lit("ShardedSelfJoin uniqueMembership contract: doc appears in " +
                  "more than one bucket; violated at doc_id="),
              coalesce(col("doc_id").cast("string"), lit("<null>"))))))
          .drop("__um_n")
      } else banded
    val bandedIn = emitOnce.fold(bandedU) { case (k, st) =>
      // Validation arbitration (ADVICE r7): an EXPLICIT conf value wins in
      // BOTH directions — set-true audits even a by-construction caller
      // (a mistaken assertion silently duplicates/drops pairs with no
      // backstop, and debugging it must not need a rebuild), set-false
      // drops the check on a validated production path. Only when the
      // conf is UNSET does the caller's by-construction assertion skip
      // the per-row re-check.
      val validate = banded.sparkSession.conf
        .getOption("spark.graft.lsh.emitOnce.validate") match {
          case Some(v) => v.toBoolean
          case None    => !emitOnceByConstruction
        }
      if (validate)
        banded.where(when(
          array_contains(col(st), col(k)) &&
            col(st) === array_sort(col(st)) &&
            size(col(st)) === size(array_distinct(col(st))),
          lit(true)
        ).otherwise(raise_error(concat(
          lit(s"ShardedSelfJoin emitOnce contract: '$st' must be a sorted, " +
              s"duplicate-free array containing the row's own '$k'; violated at doc_id="),
          // coalesce: concat() is null-out on null doc_id, and
          // raise_error(null) would lose the diagnostic (ADVICE r7)
          coalesce(col("doc_id").cast("string"), lit("<null>"))))))
      else banded
    }
    // Annotate shard counts via a broadcast of ONLY the oversized
    // buckets, not a window over every bucket: oversized buckets are few
    // by definition (each holds > threshold docs, so a 10^10-doc corpus
    // has at most docs·bands/threshold of them, each a 3-column row),
    // while a window would shuffle+sort the whole banded frame. The
    // aggregate itself map-side combines to one row per bucket before
    // shuffling. Normal buckets miss the join → nsh=1 → the original
    // single-cell join, zero extra shuffle.
    val big = bandedIn.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bn")).where(col("bn") > threshold)
    val sharded = bandedIn.join(broadcast(big), keys, "left")
      .withColumn("nsh",
        coalesce(ceil(col("bn") / lit(threshold.toDouble)).cast("int"), lit(1)))
      .withColumn("srow", pmod(xxhash64(col("doc_id")), col("nsh")).cast("int"))
    val a = sharded
      .withColumn("p", col("srow"))
      .withColumn("q", explode(sequence(col("srow"), col("nsh") - 1)))
    val b = sharded
      .withColumn("q", col("srow"))
      .withColumn("p", explode(sequence(lit(0), col("srow"))))
    val joinKeys = keys ++ Seq("p", "q")
    // Width-pin the candidate join's input exchanges (round 13
    // optimization). This join's INPUT is narrow and small (one
    // ~24-byte row per (doc, bucket)) but its intra-stage fan-out is
    // O(Σ|cell|²) — at sf0.1 the minhash banding feeds ~80k rows in and
    // expands to ~20M raw candidates INSIDE the stage, each paying the
    // emit-once merge scan. AQE's byte-based coalescing prices the stage
    // by input bytes only (it cannot see join fan-out), so it folded the
    // heaviest stage of the whole pair family onto a handful of tasks
    // (llm_minhash 4.41 → 2.58 s min with coalescing disabled — the
    // diagnosis A/B; the global conf stays ON because the same
    // coalescing WINS on the family's many genuinely-tiny stages).
    // Explicit numPartitions exempts exactly these two exchanges from
    // coalescing; hashing the FULL join key (bucket ++ (p, q)) keeps a
    // sharded hot bucket's triangle cells on distinct tasks (hashing the
    // bucket key alone would re-serialize the skew the sharding exists
    // to spread). Width = max(defaultParallelism, session shuffle
    // width): scales with cores/conf, never a local constant; at corpus
    // scale the exchange is the same one the join would have inserted —
    // only its immunity to size-based coalescing changes.
    val width = math.max(banded.sparkSession.sparkContext.defaultParallelism,
      banded.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val aW = if (pinWidth) a.repartition(width, joinKeys.map(col): _*) else a
    val bW = if (pinWidth) b.repartition(width, joinKeys.map(col): _*) else b
    // A pair whose lower-shard doc has the HIGHER doc_id only meets in
    // its one (sx, sy) cell with that doc on the A side, so a blanket
    // `a.doc_id < b.doc_id` predicate would drop it. In OFF-diagonal
    // cells (p < q) each pair meets exactly once (shard assignment fixes
    // the roles) — accept it in whatever doc order and normalize in the
    // projection. DIAGONAL cells (p = q) see both orderings, so there —
    // and only there — keep the `<` filter; this also makes an unsharded
    // bucket (single (0,0) cell) byte-identical to the original join
    // instead of producing every pair twice and paying 2× into distinct.
    val aLower = col("a.doc_id") < col("b.doc_id")
    val sel =
      Seq(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b")) ++
      carry.flatMap(c => Seq(
        when(aLower, col(s"a.$c")).otherwise(col(s"b.$c")).as(s"${c}_a"),
        when(aLower, col(s"b.$c")).otherwise(col(s"a.$c")).as(s"${c}_b")))
    val joinedRaw = aW.as("a")
      .join(bW.as("b"),
        joinKeys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
        (col("a.p") =!= col("a.q") || aLower))
    // Operator order (round 8, the reorder that flipped round 6's
    // measured-negative emit-once on the rarity path): project →
    // pairFilter → emit-once. The caller's pair predicates (size
    // prefilter, incremental's new↔old restriction) are PURE functions
    // of the pair — identical for every bucket copy of it — so filtering
    // before the emit-once merge scan changes nothing about which single
    // copy survives, while the scan now taxes only predicate SURVIVORS
    // (sf0.1: 5.0 M of 8.0 M raw) instead of every raw candidate. A/B at
    // sf0.1 min-of-3 on the rarity block join: distinct-after-filter
    // 2.7–3.0 s vs emit-once-after-filter 1.2 s at the identical
    // 1 659 184-row output. The set/key columns ride the projection under
    // reserved names and are dropped after the scan — they live only
    // inside the fused codegen stage, never crossing a shuffle. MUST
    // stay codegen'd: the equivalent array_min(array_intersect(..)) is
    // CodegenFallback and demotes the whole join stage to interpreted
    // eval (functions.EmitOnceMin note).
    val emitCols = emitOnce.toSeq.flatMap { case (k, st) =>
      Seq(col(s"a.$st").as("__eo_sa"), col(s"b.$st").as("__eo_sb"),
          col(s"a.$k").as("__eo_k"))
    }
    val joined = joinedRaw.select(sel ++ emitCols: _*)
    val filtered = pairFilter.fold(joined)(joined.where)
    val emitted = emitOnce.fold(filtered) { case (_, _) =>
      graft.functions.VectorExprs.register(banded.sparkSession)
      filtered.where(call_function(
          "graft_emit_once", col("__eo_sa"), col("__eo_sb"), col("__eo_k")))
        .drop("__eo_sa", "__eo_sb", "__eo_k")
    }
    // triangle cells meet a pair once per bucket; with emit-once a pair
    // also survives only ONE bucket — and with single-bucket membership
    // it only HAS one bucket — so in both cases the output is already
    // duplicate free and the distinct shuffle is unnecessary
    if (emitOnce.isDefined || uniqueMembership) emitted else emitted.distinct()
  }
}
