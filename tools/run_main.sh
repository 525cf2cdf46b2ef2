#!/usr/bin/env bash
# Run a graft main outside sbt (same flags build.sbt forks with) so long
# gate/bench runs don't hold the sbt build lock while iteration continues.
#   tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/vout [qname ...]
set -euo pipefail
CLS="$1"; shift
# GRAFT_CLASSES overrides the classes dir — lets an A/B run time a
# previously-compiled snapshot against the current tree on the same box
CP="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$CLS" "$@"
