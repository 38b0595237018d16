#!/bin/bash
# Run a graft main class directly (no sbt lock): scripts/run_graft.sh <MainClass> [args...]
# Env: GRAFT_MEM (default 24g)
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${GRAFT_MEM:-24g} -cp "$CP" "$@"
