#!/bin/bash
# Run a graft main class directly on the compiled classes + /opt/spark/jars,
# bypassing sbt (no build-lock contention with a concurrent `sbt test`, no
# ~20 s sbt startup per invocation). JVM flags mirror build.sbt exactly so
# a run here is the same measurement as a driver `sbt runMain` run.
# Usage: tools/run_main.sh <mainClass> [args...]
set -eu
CLS=$1; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS ${SPARK_GRAFT_JVM_EXTRA:-} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -XX:ReservedCodeCacheSize=512m \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$CLS" "$@"
