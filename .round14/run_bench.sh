#!/bin/bash
# usage: run_bench.sh <heap> <sfdir> <only-csv> [extra -D flags...]
HEAP="$1"; shift
DIR="$1"; shift
ONLY="$1"; shift
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
if [ -n "$ONLY" ] && [ "$ONLY" != "-" ]; then export SPARK_GRAFT_BENCH_ONLY="$ONLY"; fi
SPARK_GRAFT_SF_DIR="$DIR" exec java $ADD_OPENS -Xmx$HEAP -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC "$@" -cp "$CP" graft.Bench
