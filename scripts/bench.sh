#!/usr/bin/env bash
# Driver-parseable bench entry point: stdout is EXACTLY graft.Bench's
# JSON lines — no sbt log decoration (sbt's `[info]` wrapping made
# BENCH_r01–r03 parsed:null). Compiles via sbt only if classes are
# missing (compile chatter goes to stderr), then execs java directly
# against the compiled classes + /opt/spark/jars.
#
# Env (all optional): SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
# SPARK_GRAFT_ITERS, SPARK_GRAFT_ONLY, SPARK_GRAFT_WARM_DIR,
# SPARK_DRIVER_MEM.
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
# always compile (no-op when fresh, goes to stderr): benching stale
# classes would silently measure old code
sbt -error compile 1>&2
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# SPARK_GRAFT_JAVA_OPTS: extra -D flags (e.g. a spark.graft.* conf
# override for a same-phase A/B) — empty by default
exec java $ADD_OPENS ${SPARK_GRAFT_JAVA_OPTS:-} \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Bench "$@"
