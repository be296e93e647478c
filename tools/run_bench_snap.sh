#!/bin/bash
# Run graft.Bench (or another main-classes main) OUTSIDE sbt from a
# snapshot of the compiled main classes — keeps the build free and gives
# fresh-JVM isolated timings (the adjudication posture the judge uses).
# Usage: tools/run_bench_snap.sh [-Dsys.prop=...]* <MainClass> [args...]
# Env: SNAP_HEAP (default 8g), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
set -euo pipefail
cd "$(dirname "$0")/.."
SNAP=/tmp/graft_bench_snap
mkdir -p "$SNAP"
rm -rf "$SNAP/classes"
cp -r target/scala-2.13/classes "$SNAP/classes"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
PROPS=()
while [[ "${1:-}" == -D* ]]; do PROPS+=("$1"); shift; done
MAIN="$1"; shift
exec java -Xmx"${SNAP_HEAP:-8g}" $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "${PROPS[@]}" \
  -cp "/opt/spark/jars/*:$SNAP/classes" \
  "$MAIN" "$@"
