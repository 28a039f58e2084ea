#!/usr/bin/env bash
# Local launcher for graft mains (Verify/Bench) with the same JDK-17
# add-opens set build.sbt gives forked sbt runs — a bare `java -cp` is
# missing sun.util.calendar and fails Spark's date decode paths
# (EXPRESSION_DECODING_FAILED on any DateType external row).
# Usage: tools/run.sh graft.Verify <sfdir> <outdir> [query...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$(ls /opt/spark/jars/*.jar | tr '\n' ':')$REPO/target/scala-2.13/classes"
OPENS=(java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
ARGS=()
for p in "${OPENS[@]}"; do ARGS+=("--add-opens=$p=ALL-UNNAMED"); done
exec java -cp "$CP" "${ARGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" "$@"
