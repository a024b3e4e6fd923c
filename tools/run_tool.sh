#!/usr/bin/env bash
# Fresh-JVM tool runner for the scaling campaign: bypasses sbt startup so
# each measurement is one clean java process (same flags build.sbt forks
# with). Usage: tools/run_tool.sh <mainClass> [args...]
set -euo pipefail
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
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
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xms${SPARK_DRIVER_MEM:-8g} -Xmx${SPARK_DRIVER_MEM:-8g} \
  -XX:+AlwaysPreTouch -XX:+UseParallelGC \
  -cp "$CP" "$@"
