#!/bin/bash
# One-command regression gate: compile, tests, verify+oracle at both SFs, bench.
set -e
cd /root/repo
echo "== compile =="; sbt -batch compile -error | tail -1
echo "== tests ==";   sbt -batch test 2>&1 | grep -E "Tests:|FAILED" | head -2
for sf in 0.001 0.01; do
  echo "== verify sf$sf =="
  out=$(mktemp -d)
  tools/run.sh graft.Verify /root/testdata/sf$sf "$out" 2>&1 | grep -E "^\[verify\]" || true
  python3 tools/check_oracle.py /root/testdata/sf$sf "$out" | tail -1
done
echo "== bench sf0.1 =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  tools/run.sh graft.Bench 2>/dev/null | tail -1
