#!/bin/bash
# Fast runner for graft mains without sbt startup overhead.
# Usage: tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/graft_out
set -e
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Heap: SPARK_DRIVER_MEM wins; else quarter of physical RAM in [2g, 24g]
# (hard-coding 24g made startup fail on small hosts).
if [ -z "$SPARK_DRIVER_MEM" ]; then
  TOTAL_KB=$(awk '/MemTotal/{print $2}' /proc/meminfo 2>/dev/null || echo 0)
  HEAP_G=$(( TOTAL_KB / 4 / 1048576 ))
  [ "$HEAP_G" -lt 2 ] && HEAP_G=2
  [ "$HEAP_G" -gt 24 ] && HEAP_G=24
  SPARK_DRIVER_MEM="${HEAP_G}g"
fi
exec java $ADD_OPENS \
  -Xmx"$SPARK_DRIVER_MEM" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
