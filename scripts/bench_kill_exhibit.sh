#!/bin/bash
# Exhibit for the round-13 bench-durability failure (BENCH_r13.json was
# rc 124 / parsed null): run graft.Bench, kill -9 the JVM the moment the
# phase-1 artifact appears (i.e. mid-protocol, before the final emit),
# then verify the kill still left (a) a parseable JSON summary line on
# stdout and (b) a parseable bench_full.json. Writes its transcript to
# /tmp/bench_kill_exhibit.log and prints PASS/FAIL.
set -u
cd "$(dirname "$0")/.."
CP_FILE=/tmp/graft_bench_cp.txt
if [ ! -s "$CP_FILE" ]; then
  sbt -batch "export Runtime/fullClasspath" 2>/dev/null | grep -E '^/' | tail -1 > "$CP_FILE"
fi
CP=$(cat "$CP_FILE")
OUT=/tmp/bench_kill_stdout.txt
cp -f bench_full.json /tmp/bench_full_backup.json 2>/dev/null
rm -f bench_full.json "$OUT"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_BENCH_RUNS=1 \
  java $OPENS -Xmx8g -cp "$CP" graft.Bench > "$OUT" 2>/dev/null &
PID=$!
for i in $(seq 1 3000); do
  if [ -s bench_full.json ]; then break; fi
  if ! kill -0 $PID 2>/dev/null; then echo "FAIL: bench exited before phase-1 emit"; exit 1; fi
  sleep 0.2
done
kill -9 $PID 2>/dev/null
wait $PID 2>/dev/null
RC=$?
python3 - "$OUT" <<'PY'
import json, sys
lines = [l for l in open(sys.argv[1]) if l.startswith('{')]
assert lines, "no JSON line on stdout after kill"
parsed = json.loads(lines[-1])
art = json.loads(open('bench_full.json').read())
assert parsed['n_ok'] > 0 and art['n_ok'] > 0
print(f"PASS: killed mid-run (rc {0}); stdout line stage={parsed['stage']} "
      f"n_ok={parsed['n_ok']}; artifact stage={art['stage']} n={art['n']}")
PY
ST=$?
if [ $ST -ne 0 ]; then
  cp -f /tmp/bench_full_backup.json bench_full.json 2>/dev/null
  exit $ST
fi

# Scenario B (round-14 verdict #1): a deliberately BUDGET-TRUNCATED run
# (pass 1 completes, the 1 s budget cuts pass 2) must label itself
# honestly — stage "pass1-only" on the truncation emit, passes_run <
# runs_intended in the final artifact — and compare_bench.py must REFUSE
# to grade its per-query figures against standing baselines (r14's
# official artifact labeled such samples "interleaved" and earned 14
# false >2x regression flags).
OUT2=/tmp/bench_truncated_stdout.txt
rm -f bench_full.json "$OUT2"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_BUDGET_S=1 SPARK_GRAFT_BENCH_FRESH=0 \
  java $OPENS -Xmx8g -cp "$CP" graft.Bench > "$OUT2" 2>/dev/null
# the compare output travels via the environment, NOT spliced into the
# Python source — a query name or flag line containing quotes/backslashes
# would break a string-interpolated assertion script
CMP_OUT=$(python3 scripts/compare_bench.py bench_full.json 2>&1) \
  python3 - "$OUT2" <<'PY'
import json, os, sys
lines = [l for l in open(sys.argv[1]) if l.startswith('{')]
stages = [json.loads(l)['stage'] for l in lines]
assert 'pass1-only' in stages, f"no pass1-only emit in {stages}"
assert 'interleaved' not in stages, \
    f"truncated run mislabeled interleaved: {stages}"
art = json.loads(open('bench_full.json').read())
assert art['passes_run'] == 1 and art['runs_intended'] == 2, \
    f"artifact passes accounting wrong: {art['passes_run']}/{art['runs_intended']}"
cmp_out = os.environ['CMP_OUT']
assert 'REFUSED' in cmp_out, f"compare_bench graded a truncated run:\n{cmp_out}"
print(f"PASS: truncated run labeled {stages}; artifact passes_run="
      f"{art['passes_run']}/{art['runs_intended']}; compare_bench refused "
      f"regression grading")
PY
ST=$?
cp -f /tmp/bench_full_backup.json bench_full.json 2>/dev/null
exit $ST
