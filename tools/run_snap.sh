#!/bin/bash
# Run a graft.tools.* rehearsal OUTSIDE sbt from a snapshot of the
# compiled classes (keeps the build free; see .claude/skills/verify).
# Usage: tools/run_snap.sh [-Dsys.prop=...]* <ToolClass> [args...]
# Env: SNAP_HEAP (default 48g), plus the tool's own SPARK_GRAFT_* knobs.
set -euo pipefail
cd "$(dirname "$0")/.."
SNAP=/tmp/graft_snap
mkdir -p "$SNAP"
rm -rf "$SNAP/classes" "$SNAP/test-classes"
cp -r target/scala-2.13/classes "$SNAP/classes"
cp -r target/scala-2.13/test-classes "$SNAP/test-classes"
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
TOOL="$1"; shift
exec java -Xmx"${SNAP_HEAP:-48g}" $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.driver.maxResultSize=12g \
  "${PROPS[@]}" \
  -cp "/opt/spark/jars/*:$SNAP/classes:$SNAP/test-classes" \
  "graft.tools.$TOOL" "$@"
