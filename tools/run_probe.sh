#!/bin/bash
# Launch a graft main class directly on the compiled classes + the Spark
# jars, bypassing sbt (so long probes don't hold the sbt project lock).
#
# Usage: SPARK_GRAFT_SCALE_N=... run_probe.sh [graft.ScaleProbe] [xmx]
#
# Heap tiering (single-JVM local mode: -Xmx IS driver + executor memory):
# the documented probe envelope runs AS WRITTEN from a clean shell —
#   n <  10M  -> 24g   (the 1M battery default; the one probe that
#                       busts an 8g heap at this tier is
#                       jaccard_hot_bucket, whose prefix-filter hot
#                       bucket holds a dense verify working set)
#   n >= 10M  -> 48g   (the 10M tier: sssp 10M's frontier joins and the
#                       ring/monolithic signature shuffles need the
#                       larger execution pool; 8g OOMs, 24g thrashes)
# Override with the second positional arg, SPARK_DRIVER_MEM (the name the
# probe recipe in SURVEY.md uses), or SPARK_GRAFT_XMX.
MAIN=${1:-graft.ScaleProbe}
N=${SPARK_GRAFT_SCALE_N:-1000000}
if [ "$N" -ge 10000000 ] 2>/dev/null; then TIER=48g; else TIER=24g; fi
XMX=${2:-${SPARK_DRIVER_MEM:-${SPARK_GRAFT_XMX:-$TIER}}}
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx$XMX \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$MAIN"
