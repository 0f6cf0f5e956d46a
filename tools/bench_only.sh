#!/bin/bash
# Isolated per-query bench (fresh JVM, graft.Bench --only) WITHOUT sbt —
# direct java against the compiled classes, so it can run while sbt holds
# the project lock.  Usage: tools/bench_only.sh q1,q2[,...] [reps]
set -e
QUERIES="$1"
REPS="${2:-3}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" exec java $OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench --only "$QUERIES" --reps "$REPS" 2>/dev/null
