#!/bin/bash
# graft-ingest / graft-sacct / graft-seff: run the CLIs with the spark
# jars on the classpath. Usage:
#   tools/run_cli.sh ingest /path/to/warehouse --sacct-input dump.txt --history-days 7
#   tools/run_cli.sh sacct --db /path/to/warehouse -u user_7
#   tools/run_cli.sh seff --csv-input dump.csv --aggregate-user
set -e
SUB=${1:?usage: run_cli.sh ingest|sacct|seff [flags...]}
shift
case "$SUB" in
  ingest) MAIN=graft.tools.IngestCli ;;
  sacct) MAIN=graft.tools.SacctCli ;;
  seff)  MAIN=graft.tools.SeffCli ;;
  *) echo "unknown subcommand '$SUB' (ingest|sacct|seff)" >&2; exit 2 ;;
esac
sbt -batch compile -error 1>&2
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
exec java -Xmx4g \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$CP" "$MAIN" "$@"
