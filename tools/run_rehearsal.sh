#!/bin/bash
# Run ScaleRehearsal: tools/run_rehearsal.sh <sfDir> <factor> [capstones [name] | families...]
#
# With no family argument, every family runs in its OWN fresh JVM —
# the r10 lesson: tail stages of the 40-stage single-JVM sweep read
# as plan walls purely from accumulated heap pressure (capstone d84
# 54.9x, html 362x, both re-measured flat in isolation). Per-family
# isolation makes recorded rows trustworthy as committed.
# Pass explicit family names (comma list) to run just those in one JVM.
set -e
sfdir=${1:-/root/testdata/sf0.1}
factor=${2:-10}
shift 2 2>/dev/null || shift $# 2>/dev/null || true

sbt -batch compile -error
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"

run_jvm() {
  java -Xmx96g \
    --add-opens=java.base/java.lang=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
    --add-opens=java.base/java.io=ALL-UNNAMED \
    --add-opens=java.base/java.net=ALL-UNNAMED \
    --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens=java.base/sun.security.action=ALL-UNNAMED \
    --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
    -Dspark.ui.enabled=false -cp "$CP" graft.tools.ScaleRehearsal "$@"
}

if [ $# -gt 0 ]; then
  # explicit mode: capstones passthrough or a family selection
  run_jvm "$sfdir" "$factor" "$@"
else
  # one fresh JVM per family
  families=$(run_jvm "$sfdir" "$factor" --list 2>/dev/null)
  for f in $families; do
    echo "=== fresh JVM for family: $f ==="
    run_jvm "$sfdir" "$factor" "$f"
  done
fi
