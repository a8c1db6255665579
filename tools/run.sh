#!/bin/bash
# Dev runner: java with the Spark unmanaged classpath + compiled classes.
# Usage: tools/run.sh <mainClass> [args...]   (env vars pass through)
set -e
MAIN=$1; shift
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar"
ADD=""
for p in $OPENS; do ADD="$ADD --add-opens $p=ALL-UNNAMED"; done
exec java $ADD -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/root/repo/src/main/resources:/opt/spark/jars/*" \
  "$MAIN" "$@"
