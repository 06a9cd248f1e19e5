#!/bin/bash
# Full-suite correctness dump at the 10x fixture (standalone JVM, bypasses sbt)
set -e
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# GRAFT_MAIN overrides the entry point (e.g. graft.InvariantCheck) so the
# sf1 gate's other standalone mains reuse the same JVM incantation.
exec java -Xmx${SPARK_DRIVER_MEM:-48g} $OPTS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" "${GRAFT_MAIN:-graft.Verify}" "$@"
