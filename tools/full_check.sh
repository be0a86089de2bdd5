#!/bin/bash
# One-command regression gate: compile, tests, verify+oracle at both SFs, bench.
# The verify+oracle path is TIMED and asserted under a budget: the driver's
# correctness phase has a finite window, and round 11 lost its artifact when
# the DuckDB replays outgrew it. Keep the sf0.01 sweep (Spark dump + both
# check_oracle passes) under BUDGET_S — if this trips, profile the oracle
# SQLs (tools/profile_oracle.py) and slim the offenders before shipping.
set -e
cd /root/repo
BUDGET_S=${GRAFT_SWEEP_BUDGET_S:-900}
echo "== compile =="; sbt -batch compile -error | tail -1
# anchor on ScalaTest's own summary lines: free-text exceptions that
# happen to contain "FAILED" (e.g. FAILED_READ_FILE warnings from async
# cleanup races) must not consume the head window and hide the summary
echo "== tests =="
test_out=$(sbt -batch test 2>&1 | grep -E "^\[info\] Tests:|^\[error\].*Failed tests" | head -3)
echo "$test_out"
# require a NONZERO succeeded count: "succeeded 0, failed 0" (test
# discovery broken, everything filtered out) must not read as green.
# Also require "canceled 0": a broken fixture turns whole suites into
# cancellations, which ScalaTest does NOT count as failures.
echo "$test_out" | grep -qE "Tests: succeeded [1-9][0-9]*, failed 0, canceled 0" \
  || { echo "FAIL: test suite not green (failed/canceled nonzero or ran zero tests)" >&2; exit 1; }
total=0
for sf in 0.001 0.01; do
  echo "== verify sf$sf =="
  out=$(mktemp -d)
  t0=$(date +%s)
  tools/run.sh graft.Verify /root/testdata/sf$sf "$out" 2>&1 | grep -E "^\[verify\]" || true
  python3 tools/check_oracle.py /root/testdata/sf$sf "$out" | tail -1
  t1=$(date +%s)
  echo "-- sweep sf$sf took $((t1 - t0))s"
  if [ "$sf" = "0.01" ]; then total=$((t1 - t0)); fi
done
if [ "$total" -gt "$BUDGET_S" ]; then
  echo "FAIL: sf0.01 verify+oracle sweep ${total}s exceeds budget ${BUDGET_S}s" >&2
  exit 1
fi
echo "OK: sf0.01 sweep ${total}s within budget ${BUDGET_S}s"
echo "== bench sf0.1 =="
bench_log=$(mktemp)
# Drive the bench EXACTLY the way the driver does — through sbt, not
# tools/run.sh. Rounds ≤13 gated the tail contract against plain-java
# output while the driver's sbt logger prefixed every line with
# "[info] ", so the gate passed for 13 rounds while the driver's parse
# failed. build.sbt's `run / outputStrategy := StdoutOutput` is what
# this gate now actually exercises.
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" 2>/dev/null > "$bench_log"
tail -2 "$bench_log"
# Assert the driver's artifact contract: it keeps only the LAST ~2000
# bytes of stdout and parses a JSON line out of that window. Every round
# before 13 shipped a bench artifact with parsed:null because the full
# line outgrew the window — keep the compact final line inside it, with
# no sbt "[info] " prefix in front of the '{'.
python3 - "$bench_log" <<'PYEOF'
import json, sys
tail = open(sys.argv[1], "rb").read()[-2000:].decode("utf-8", "replace")
lines = [l for l in tail.splitlines() if l.strip().startswith("{")]
assert lines, "no complete JSON line inside the 2000-byte tail window"
d = json.loads(lines[-1])
assert d.get("errors") == [], f"bench errors: {d.get('errors')}"
assert isinstance(d.get("value"), (int, float)), "compact line missing numeric value"
assert isinstance(d.get("cold_s"), (int, float)), "compact line missing numeric cold_s"
assert isinstance(d.get("min_s"), (int, float)), "compact line missing numeric min_s"
assert isinstance(d.get("metric_version"), int), "compact line missing metric_version"
print(f"OK: bench tail parses (n={d.get('n')}, metric_v{d.get('metric_version')}, "
      f"warm={d.get('value'):.1f}s, cold={d.get('cold_s'):.1f}s, min={d.get('min_s'):.1f}s)")
PYEOF
