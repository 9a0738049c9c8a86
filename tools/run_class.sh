#!/usr/bin/env bash
# Run a graft main class via plain java (no sbt lock contention with a
# background sweep). Usage: tools/run_class.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_GC_OPTS, plus whatever the
# main reads (GRAFT_VERIFY_ONLY, SPARK_GRAFT_SF_DIR, ...).
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" ${SPARK_GC_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
