#!/bin/bash
# Builder-local helper: dump the named queries (or all) at one SF and
# strict-compare vs the DuckDB oracle. Usage: run_strict.sh <sf> [query...]
# Fails fast (r15 advice): the output dir is cleared up front and a
# Verify crash fails the script, so strictcheck can never compare stale
# dumps from a previous run and report a false pass.
set -euo pipefail
sf=$1; shift
out=/tmp/r16_verify_$sf
log=$out.log
rm -rf "$out" "$log"
if ! SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} java -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    -Xmx12g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
    graft.Verify ${SF_DIR:-/root/testdata/$sf} $out "$@" >"$log" 2>&1; then
  echo "graft.Verify FAILED (exit status propagated); last lines:"
  tail -20 "$log"
  exit 1
fi
grep -Ei "failed|error" "$log" | head -20 || true
python3 /root/repo/scripts/strictcheck.py ${SF_DIR:-/root/testdata/$sf} $out "$@"
