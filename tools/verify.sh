#!/bin/bash
# Local correctness loop: Spark Verify dump at sf0.01 -> DuckDB compare.
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
rm -rf "$OUT"
sbt -error "runMain graft.Verify $SF $OUT"
python3 tools/compare.py "$SF" "$OUT"
