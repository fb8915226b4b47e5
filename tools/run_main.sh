#!/bin/bash
# Launch a graft main class outside sbt (same JVM options build.sbt forks
# with). Usage: tools/run_main.sh <MainClass> [args...]
# Env: MEM (default 24g) -> -Xmx; extra env consumed by the main itself.
set -eu
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$REPO/target/scala-2.13/classes"
if [ ! -d "$CLASSES" ]; then
  echo "run_main.sh: $CLASSES missing — run 'sbt compile' first" >&2
  exit 1
fi
CP="$CLASSES:/opt/spark/jars/*"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent \
         java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
         java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
MAIN="$1"; shift
exec java $OPENS -Xmx"${MEM:-24g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "graft.$MAIN" "$@"
