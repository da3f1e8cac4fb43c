#!/bin/bash
# Direct-JVM runner for graft mains — same flags as build.sbt's
# javaOptions (run/fork), no sbt project lock: lets a long Verify/Bench
# run coexist with an interactive sbt session. Classes must already be
# compiled (sbt compile); this does NOT compile.
#
# Usage: tools/jrun.sh <mainClass> [args...]
# Env:   SPARK_DRIVER_MEM (default 24g) — same knob as build.sbt
#        GRAFT_CLASSES (default target/scala-2.13/classes) — point a
#        long-running job at a SNAPSHOT copy of the classes dir so a
#        concurrent `sbt compile` can't swap class files under its
#        lazy-loading JVM mid-run.
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -cp "${GRAFT_CLASSES:-target/scala-2.13/classes}:/opt/spark/jars/*" \
  "$@"
