#!/bin/bash
# A/B adjudication for an elevated bench row: is it a plan regression
# or host drift? Interleaves solo QueryTimer runs of the SAME query on
# the current tree and a pinned baseline-era commit, same window —
# if the old tree reproduces the elevated number, the host moved, not
# the plan (r15 protocol; used to adjudicate the d26/d30/d43 family:
# the untouched r14 tree read within noise of HEAD while both sat ~2x
# over the r10/r11-era baseline rows, and the string calib moved where
# the dot calib did not).
#
# Usage: tools/ab_tree.sh <commit> <query> [reps=6] [rounds=2] [sfDir]
set -e
commit=${1:?commit}
query=${2:?query key}
reps=${3:-6}
rounds=${4:-2}
sfdir=${5:-/root/testdata/sf0.1}

wt=/tmp/graft_ab_$commit
if [ ! -d "$wt" ]; then
  git worktree add "$wt" "$commit"
  (cd "$wt" && sbt -batch compile -error)
fi
sbt -batch compile -error
SP=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
run() {
  java -Xmx16g \
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
    -Dspark.ui.enabled=false \
    -cp "$1/target/scala-2.13/classes:$SP" \
    graft.tools.QueryTimer "$sfdir" "$query" "$reps" 2>/dev/null | tail -1
}
for i in $(seq 1 "$rounds"); do
  echo "old($commit): $(run "$wt")"
  echo "new(HEAD):    $(run "$PWD")"
done
echo "(worktree kept at $wt; remove with: git worktree remove --force $wt)"
