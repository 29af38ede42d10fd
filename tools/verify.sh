#!/bin/bash
# Local correctness loop: Spark Verify dump at sf0.01 -> DuckDB compare,
# then the Python-facade smoke test (skipped when pyspark isn't on the
# driver python path).
set -e -o pipefail
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
rm -rf "$OUT"
sbt -error "runMain graft.Verify $SF $OUT"
python3 tools/compare.py "$SF" "$OUT"
if python3 -c "import pyspark" 2>/dev/null; then
  python3 tools/pysmoke.py /root/testdata/sf0.001 | tail -1
else
  echo "pysmoke skipped (pyspark not importable)"
fi
