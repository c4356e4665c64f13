#!/bin/bash
# Local mirror of the driver's correctness run:
#   tools/verify.sh [sfdir] [outdir]
# Runs graft.Verify from compiled classes (sbt compile first), then
# tools/check.py compares each dumped result against DuckDB.
set -e
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
rm -rf "$OUT"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} java $ADD_OPENS \
  -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-16g} \
  graft.Verify "$SF" "$OUT"
python3 /root/repo/tools/check.py "$SF" "$OUT"
