#!/usr/bin/env bash
# Launch a graft main (ScaleGrowth, BandSaturation, Bench, Verify, ...)
# with the exact JVM posture build.sbt forks with, but WITHOUT taking
# sbt's project lock — so a multi-hour growth run and an sbt compile/test
# can coexist. Compile first (sbt -batch compile); this only runs classes.
#
# Usage: [ENV...] scripts/run_main.sh graft.ScaleGrowth [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio
  java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs
  java.base/sun.security.action java.base/sun.util.calendar
)
FLAGS=()
for p in "${ADD_OPENS[@]}"; do FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$MAIN" "$@"
