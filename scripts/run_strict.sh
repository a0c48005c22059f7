#!/bin/bash
# Builder-local helper: dump the named queries (or all) at one SF and
# strict-compare vs the DuckDB oracle. Usage: run_strict.sh <sf> [query...]
set -u
sf=$1; shift
out=/tmp/r15_verify_$sf
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} java -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  -Xmx12g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  graft.Verify ${SF_DIR:-/root/testdata/$sf} $out "$@" 2>&1 | grep -Ei "failed|error" | head -20
python3 /root/repo/scripts/strictcheck.py ${SF_DIR:-/root/testdata/$sf} $out "$@"
