#!/bin/bash
# Launch a graft main class directly on the compiled classes + the Spark
# jars, bypassing sbt (so long probes don't hold the sbt project lock).
# Usage: SPARK_GRAFT_SCALE_N=... run_probe.sh [graft.ScaleProbe] [xmx]
MAIN=${1:-graft.ScaleProbe}
XMX=${2:-100g}
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
