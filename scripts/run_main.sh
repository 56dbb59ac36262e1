#!/bin/bash
# Run a graft main class via plain `java`, replicating build.sbt's forked-run
# JVM settings (JDK-17 add-opens, UTC, no UI, SPARK_DRIVER_MEM heap). Exists
# so long slice/cert jobs don't hold the sbt lock: `sbt -batch runMain` and a
# compile can't run concurrently, but compiled classes + /opt/spark/jars can.
# The caller must have run `sbt compile` first — this script fails loudly if
# the classes directory is missing rather than silently running stale code it
# cannot detect (it does NOT recompile).
#
# Usage: scripts/run_main.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."

CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "no $CLASSES — run sbt compile first" >&2; exit 2; }

ADD_OPENS=()
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  ADD_OPENS+=(--add-opens "$p=ALL-UNNAMED")
done

exec java "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$@"
