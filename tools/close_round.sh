#!/bin/bash
# Close out a round MECHANICALLY (the round-12/13/14 process lesson: round
# artifacts were uncommitted at judging three rounds running, and round 14
# had no committed test record at all). One invocation:
#
#   1. `sbt -batch test`                    → TEST_r{N}.json
#   2. graft.Verify @ sf0.01 + check.py     → CORRECTNESS_r{N}.json
#   3. graft.Bench  @ sf0.1                 → BENCH_r{N}.json (+ bench_last.json)
#   4. one commit of the round artifacts (plus any refreshed *.json
#      artifacts already tracked at the repo root: demo/audit lines)
#
# Artifact formats mirror the driver's records (BENCH: n/rc/cpus/sf/tail/
# parsed wrapper; CORRECTNESS: per-query match booleans; TEST: sbt summary)
# so the committed files and the driver-scraped ones read the same.
#
# Usage: tools/close_round.sh <round-number>
#   env: SPARK_GRAFT_CPUS (default 32), CLOSE_ROUND_SKIP_BENCH=1 to reuse
#   an already-fresh bench_last.json instead of a ~6 min re-run.
set -euo pipefail
cd /root/repo
N=${1:?usage: tools/close_round.sh <round-number>}
RN=$(printf 'r%02d' "$N")
CPUS=${SPARK_GRAFT_CPUS:-32}

# Round-17 lesson: a re-run AFTER the closing commit landed in a poisoned
# host window and overwrote the committed BENCH record with a 1.9×-slower
# one, leaving the tree contradicting round-of-record. Once a round's
# artifacts are committed they are final — refuse to regenerate them.
for f in "TEST_${RN}.json" "CORRECTNESS_${RN}.json" "BENCH_${RN}.json"; do
  if git cat-file -e "HEAD:$f" 2>/dev/null; then
    if [ "${CLOSE_ROUND_FORCE:-0}" != "1" ]; then
      echo "[close_round] ABORT: $f is already committed (round $N closed)."
      echo "[close_round] Re-closing would overwrite the round-of-record;"
      echo "[close_round] set CLOSE_ROUND_FORCE=1 only if that is intended."
      exit 2
    fi
    echo "[close_round] WARNING: overwriting committed $f (CLOSE_ROUND_FORCE=1)"
  fi
done

echo "[close_round] 1/4 sbt test"
sbt -batch test >/tmp/close_round_test.log 2>&1 && TEST_RC=0 || TEST_RC=$?
tail -4 /tmp/close_round_test.log
python3 - "$RN" "$TEST_RC" <<'EOF'
import re, sys, json
rn, rc = sys.argv[1], int(sys.argv[2])
log = open('/tmp/close_round_test.log').read()
def grab(pat, default=0):
    m = re.search(pat, log)
    return int(m.group(1)) if m else default
rec = {
    "metric": "sbt_test",
    "suites": grab(r"Suites: completed (\d+)"),
    "tests": grab(r"Total number of tests run: (\d+)"),
    "succeeded": grab(r"Tests: succeeded (\d+)"),
    "failed": grab(r"succeeded \d+, failed (\d+)"),
    "note": f"tools/close_round.sh {rn}: full `sbt test`, exit {rc}"
            + ("" if rc == 0 else " (FAILING - see /tmp/close_round_test.log)"),
}
open(f"TEST_{rn}.json", "w").write(json.dumps(rec, indent=1) + "\n")
print(f"[close_round] TEST_{rn}.json: {rec['succeeded']}/{rec['tests']} "
      f"across {rec['suites']} suites, exit {rc}")
EOF
[ "$TEST_RC" -eq 0 ] || { echo "[close_round] ABORT: sbt test failed"; exit 1; }

echo "[close_round] 2/4 correctness @ sf0.01"
SPARK_GRAFT_CPUS=$CPUS tools/runmain.sh graft.Verify /root/testdata/sf0.01 \
  /tmp/close_round_verify 2>/tmp/close_round_verify.err
python3 tools/check.py --json "CORRECTNESS_${RN}.json" \
  /root/testdata/sf0.01 /tmp/close_round_verify | tail -2

if [ "${CLOSE_ROUND_SKIP_BENCH:-0}" != "1" ]; then
  echo "[close_round] 3/4 bench @ sf0.1"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$CPUS \
    SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-16g} \
    tools/runmain.sh graft.Bench >/tmp/close_round_bench.out 2>/tmp/close_round_bench.err \
    && BENCH_RC=0 || BENCH_RC=$?
else
  echo "[close_round] 3/4 bench skipped (CLOSE_ROUND_SKIP_BENCH=1)"
  BENCH_RC=0
fi
python3 - "$N" "$BENCH_RC" "$CPUS" <<'EOF'
import json, os, sys
n, rc, cpus = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
skip = os.environ.get("CLOSE_ROUND_SKIP_BENCH", "0") == "1"
if skip:
    # reuse the durable record's full line as the parsed payload
    full = json.load(open("bench_last.json")) if os.path.exists("bench_last.json") else None
    tail, parsed = "reused bench_last.json (CLOSE_ROUND_SKIP_BENCH=1)", full
else:
    out = open("/tmp/close_round_bench.out").read().strip().splitlines()
    line = out[-1] if out else ""
    err = open("/tmp/close_round_bench.err", errors="replace").read()
    tail = (err + "\n" + line)[-2000:]
    try:
        parsed = json.loads(line)
    except Exception:
        parsed = None
rec = {"n": n, "rc": rc, "cpus": cpus, "sf": 0.1, "tail": tail, "parsed": parsed}
open(f"BENCH_r{n:02d}.json", "w").write(json.dumps(rec, indent=1) + "\n")
ok = parsed is not None and rc == 0
print(f"[close_round] BENCH_r{n:02d}.json: rc={rc} parsed={'ok' if ok else 'MISSING'}"
      + (f" total={parsed.get('value')}s n={parsed.get('n')}" if parsed else ""))
EOF

echo "[close_round] 4/4 leakcheck + commit"
# regenerate LEAKCHECK.json for THIS round (the round-15 residual: the
# committed copy carried the prior round's content because it wasn't in
# the regeneration set). A nonzero hit count aborts the close.
python3 tools/leakcheck.py "$N"
git add "TEST_${RN}.json" "CORRECTNESS_${RN}.json" "BENCH_${RN}.json" LEAKCHECK.json
# refreshed tracked artifacts (bench_last.json, demo/audit lines) ride in
# the same commit — round artifacts must never sit dirty at judging
git add -u -- '*.json'
git commit -m "round ${N}: test/correctness/bench artifacts (close_round.sh)" \
  || echo "[close_round] nothing to commit (already clean)"
git log --oneline -1
git status --short
