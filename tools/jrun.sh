#!/usr/bin/env bash
# Run a graft main class directly on the compiled classes + Spark jars,
# bypassing sbt (no build-lock serialization; assumes `sbt compile` ran).
# Usage: tools/jrun.sh <MainClass> [args...]   (env passes through)
set -euo pipefail
cd "$(dirname "$0")/.."
# GRAFT_CLASSES overrides the classes dir: long background runs (the sf30
# Verify dump) execute off a snapshot copy so concurrent sbt compiles
# cannot swap class files under the running JVM's lazy classloading.
CLASSES=${GRAFT_CLASSES:-target/scala-2.13/classes}
MAIN=$1; shift
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "graft.$MAIN" "$@"
