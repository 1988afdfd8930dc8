#!/usr/bin/env bash
# ×k scale-oracle arm (VERDICT r11 #2): the CORRECTNESS gate runs at
# sf0.01 and the scale harnesses (DedupScale/GraphScale/VectorScale) only
# TIME the ×10-×100 legs — this script HASH-CHECKS the answers at scale:
#   StressGen ×k corpus (graph relational mode — independent co-purchase
#   graph copies so the fixed-round CC oracle's convergence depth is
#   k-invariant; dup-heavy documents; embeddings ×k)
#   → graft.Verify on the subset (SPARK_GRAFT_ONLY)
#   → DuckDB oracle compare (multiset mode kicks in automatically for
#     results past GRAFT_MULTISET_THRESHOLD rows).
# The target set is the heavy families where an AQE re-plan, a DECIMAL
# overflow at bigger sums, or a threshold drift would only show at scale.
#
# Usage: scripts/scale_oracle.sh [k] [srcSfDir] [queries]
# Env: SPARK_DRIVER_MEM (default 16g), SPARK_GRAFT_CPUS (default 32),
#      SPARK_GRAFT_REUSE=0 to regenerate the corpus.
set -euo pipefail
cd "$(dirname "$0")/.."
K="${1:-10}"
SRC="${2:-/root/testdata/sf0.1}"
QUERIES="${3:-llm_dedup_cluster,llm_cluster_sizes,llm_pair_table,llm_jaccard_pairs,llm_kmeans,graph_cc,llm_shard_balance,agg_gini,agg_weighted}"
DST="${SPARK_GRAFT_SCALE_DIR:-/tmp/graft_scale_x$K}"
OUT="${DST}_out"
CLASSES=target/scala-2.13/classes

sbt -error compile 1>&2
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
JAVA=(java $ADD_OPENS "-Xmx${SPARK_DRIVER_MEM:-16g}"
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC
      -cp "$CLASSES:/opt/spark/jars/*")

# _DONE records the GENERATION PARAMETERS, not just completion (ADVICE
# r12): reusing a corpus built from a different SRC/k/mode would silently
# check the wrong data. Mismatched params regenerate.
# gen= bumps when StressGen's synthesis changes (r13a: URL-bearing docs +
# BUILDING-skewed customer copies) — same CLI params, different corpus
GEN_PARAMS="src=$SRC k=$K docs=dup:$K emb=$K mode=graph gen=r13a"
if [ ! -f "$DST/_DONE" ] || [ "$(cat "$DST/_DONE" 2>/dev/null)" != "$GEN_PARAMS" ] \
   || [ "${SPARK_GRAFT_REUSE:-1}" != "1" ]; then
  echo "[scale_oracle] generating $DST = $SRC x$K (graph mode, dup:$K docs)" 1>&2
  rm -rf "$DST"
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    "${JAVA[@]}" graft.tools.StressGen "$SRC" "$DST" "$K" "dup:$K" "$K" graph 1>&2
  printf '%s' "$GEN_PARAMS" > "$DST/_DONE"
fi

echo "[scale_oracle] verifying subset: $QUERIES" 1>&2
SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  "${JAVA[@]}" graft.Verify "$DST" "$OUT" 1>&2

# staged-CTE evaluation: same SQL text per stage, but each WITH body
# materializes as its own temp table — DuckDB's flattened join tree on
# the deep doc-family pipelines never finished at x10 otherwise
GRAFT_STAGE_CTES=1 python3 scripts/local_oracle_check.py "$DST" "$OUT"
