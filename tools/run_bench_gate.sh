#!/bin/bash
# Retry-until-clean bench gate (VERDICT r12 task 6): the committed round
# artifact must never be a host-contended run. Pre-checks load with
# --calib-only (par_ratio < 1.2 ~= quiet), runs the full bench, and if the
# artifact comes back host_contended cools down and retries (max 3 attempts).
# Only a clean artifact is left in BENCH_LAST.json; exit 0 iff clean.
set -u
SF=${1:-/root/testdata/sf0.1}
CPUS=${SPARK_GRAFT_CPUS:-32}
COOLDOWN=${BENCH_COOLDOWN_SEC:-240}
MAX_TRIES=${BENCH_MAX_TRIES:-3}

sbt -batch compile -error || exit 1
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
JAVA_FLAGS="--add-opens=java.base/java.lang=ALL-UNNAMED
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED
--add-opens=java.base/java.io=ALL-UNNAMED
--add-opens=java.base/java.net=ALL-UNNAMED
--add-opens=java.base/java.nio=ALL-UNNAMED
--add-opens=java.base/java.util=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED
--add-opens=java.base/sun.security.action=ALL-UNNAMED
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

for try in $(seq 1 "$MAX_TRIES"); do
  echo "[gate] attempt $try/$MAX_TRIES: --calib-only pre-check" >&2
  PRE=$(SPARK_GRAFT_CPUS=$CPUS java -Xmx2g $JAVA_FLAGS -Dspark.ui.enabled=false \
        -cp "$CP" graft.Bench --calib-only 2>/dev/null | tail -1)
  echo "[gate] pre-check: $PRE" >&2
  RATIO=$(python3 -c "import json,sys; print(json.loads('$PRE')['par_ratio'])" 2>/dev/null || echo 99)
  # the pre-check only avoids STARTING mid-spike; the in-run detector
  # (measured par floor + broad-spread + drift, Bench.scala r13) is the
  # authoritative one. Absolute 2.0 accommodates the measured r13 host
  # profile (idle floor 1.5-1.8 - SURVEY §8.15).
  if python3 -c "import sys; sys.exit(0 if float('$RATIO') < 2.0 else 1)"; then
    SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS java -Xmx8g $JAVA_FLAGS \
      -Dspark.ui.enabled=false -cp "$CP" graft.Bench
    python3 tools/check_bench.py BENCH_LAST.json
    RC=$?
    if [ "$RC" -eq 0 ]; then
      echo "[gate] CLEAN artifact in BENCH_LAST.json (attempt $try)" >&2
      exit 0
    fi
    if [ "$RC" -eq 1 ]; then
      echo "[gate] REGRESSION on a clean run - real signal, not retrying" >&2
      exit 1
    fi
    echo "[gate] run flagged host_contended - cooling down ${COOLDOWN}s" >&2
  else
    echo "[gate] host busy (par_ratio $RATIO >= 2.0) - cooling down ${COOLDOWN}s" >&2
  fi
  [ "$try" -lt "$MAX_TRIES" ] && sleep "$COOLDOWN"
done
echo "[gate] FAILED: no clean run in $MAX_TRIES attempts" >&2
exit 2
