#!/usr/bin/env bash
# Run a graft main (Bench/Verify/ScaleProbe/...) directly with java,
# bypassing sbt so long measurement runs don't hold the sbt lock.
# Usage: SPARK_DRIVER_MEM=48g tools/run_main.sh graft.Bench [args...]
# Compile first: sbt compile Test/compile (this script does NOT compile).
set -euo pipefail
REPO=/root/repo
[ $# -ge 1 ] || { echo "usage: $0 <mainClass> [args...]" >&2; exit 2; }
MAIN="$1"; shift
# pinned to the scala-2.13 artifacts (plus the scala-free
# scalatest-compatible java API jar) so a cache holding other scala
# versions can never put two variants of one artifact on the classpath
TESTJARS=$(find /root/.cache/coursier \
  \( -name '*_2.13-*.jar' -o -name 'scalatest-compatible-*.jar' \) \
  \( -path '*scalatest*' -o -path '*scalactic*' -o -path '*scalacheck*' \) \
  2>/dev/null | tr '\n' ':')
CP="$REPO/target/scala-2.13/classes:$REPO/target/scala-2.13/test-classes:${TESTJARS}/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$MAIN" "$@"
