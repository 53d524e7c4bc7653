#!/usr/bin/env bash
# One-shot round-evidence runner (r9, VERDICT r8 item 8): produce every
# per-round artifact the judge re-verifies, in one command, so the
# evidence habit is mechanical instead of manual:
#
#   PYTEST_r0N.txt            full pytest, ONE run
#   CHECK_r0N_strict.txt      scripts/check_correctness.py at sf0.01
#   CHECK_r0N_strict_sf01.txt same at sf0.1
#   CHECK_r0N_strict_sf1.txt  same at a freshly-rebuilt 10x /tmp/sf1
#   SUSTAINED_r0N.json        scripts/sustained_stream_bench.py (its
#                             in-script asserts are the gate; rc!=0 fails)
#   BENCH_sf1_r0N.json        bench.py on the rebuilt sf1 corpus
#
# Usage: scripts/round_evidence.sh <round>     e.g. scripts/round_evidence.sh 9
# Runs serially (the host is shared; parallel Spark sessions poison the
# latency numbers).  Progress \r junk is stripped before the artifacts
# are written (the r7 lesson).  Exits nonzero on the FIRST failing step.

set -euo pipefail
cd "$(dirname "$0")/.."

# An interrupted run must never leave a partial .tmp for a later
# `git add -A` to commit (the r11 CHECK_r11_strict.txt.tmp defect) —
# sweep every artifact tmp on ANY exit, and .gitignore *.tmp besides.
trap 'rm -f PYTEST_*.tmp CHECK_*.tmp SUSTAINED_*.tmp BENCH_*.tmp' EXIT

R="${1:?usage: round_evidence.sh <round-number>}"
RR=$(printf "r%02d" "$R")
strip_cr() { sed -e 's/\r[^\n]*\r//g' -e 's/\r//g'; }

# Solo-run guard (VERDICT r13 item 5): the r13 sf1 clone-lane artifact
# drifted ~1.3x on sub-2s queries because a corpus build ran nearby.
# Benches are latency artifacts — refuse to start a timed step while any
# other process is busy (>50% of a core).  bench.py additionally records
# a run_conditions stanza inside the JSON itself.
require_solo() {
  local busy
  busy=$(ps -eo pid,pcpu,comm | awk -v me=$$ 'NR>1 && $2>50 && $1!=me {print $3}' | head -3)
  if [ -n "$busy" ]; then
    echo "FATAL: refusing to run timed step with busy processes: $busy" >&2
    exit 1
  fi
}

# Atomic artifact write (VERDICT r10 item 1): every step writes to
# <artifact>.tmp and only a SUCCESSFUL, NON-EMPTY run is renamed into
# place — an interrupted re-run can no longer truncate a good artifact
# to 0 bytes (the BENCH_sf1_r10.json defect).
finish() {
  local art="$1"
  if [ ! -s "${art}.tmp" ]; then
    echo "FATAL: ${art}.tmp is empty or missing — keeping prior ${art}" >&2
    rm -f "${art}.tmp"
    exit 1
  fi
  mv "${art}.tmp" "${art}"
}

echo "== [1/6] pytest fast tier (the driver-verify run) -> PYTEST_${RR}.txt"
python -m pytest tests/ -q 2>&1 | strip_cr > "PYTEST_${RR}.txt.tmp"
finish "PYTEST_${RR}.txt"
tail -2 "PYTEST_${RR}.txt"

echo "== [1b] pytest slow tier -> PYTEST_${RR}_slow.txt"
# r16 tiering (VERDICT r15 item 7): the default run is the fast tier the
# driver's verify window can finish; the slow (e2e/scale) tier is still
# run and committed here so the full suite stays proven green per round.
python -m pytest tests/ -q -m slow --runslow 2>&1 | strip_cr \
  > "PYTEST_${RR}_slow.txt.tmp"
finish "PYTEST_${RR}_slow.txt"
tail -2 "PYTEST_${RR}_slow.txt"

echo "== [2/6] strict check sf0.01 -> CHECK_${RR}_strict.txt"
python scripts/check_correctness.py 2>&1 | strip_cr \
  > "CHECK_${RR}_strict.txt.tmp"
finish "CHECK_${RR}_strict.txt"
tail -2 "CHECK_${RR}_strict.txt"

echo "== [3/6] strict check sf0.1 -> CHECK_${RR}_strict_sf01.txt"
SF_DIR=/root/testdata/sf0.1 python scripts/check_correctness.py 2>&1 \
  | strip_cr > "CHECK_${RR}_strict_sf01.txt.tmp"
finish "CHECK_${RR}_strict_sf01.txt"
tail -2 "CHECK_${RR}_strict_sf01.txt"

echo "== [4/6] rebuild /tmp/sf1 (10x) + strict check -> CHECK_${RR}_strict_sf1.txt"
rm -rf /tmp/sf1
python scripts/make_sf_scale.py /tmp/sf1 10
SF_DIR=/tmp/sf1 python scripts/check_correctness.py 2>&1 \
  | strip_cr > "CHECK_${RR}_strict_sf1.txt.tmp"
finish "CHECK_${RR}_strict_sf1.txt"
tail -2 "CHECK_${RR}_strict_sf1.txt"

echo "== [4b] hash-only comparator verdict parity at sf1 -> CHECK_${RR}_hash_sf1.txt"
# The collect-free signature comparator (scripts/check_correctness.py
# --hash-only) must reach the same 50/50 verdict as the row-compare path
# it sits beside — this artifact is the standing proof that the >=sf10
# scale gates run on an equivalent comparator (VERDICT r13 item 4).
SF_DIR=/tmp/sf1 python scripts/check_correctness.py --hash-only 2>&1 \
  | strip_cr > "CHECK_${RR}_hash_sf1.txt.tmp"
finish "CHECK_${RR}_hash_sf1.txt"
tail -2 "CHECK_${RR}_hash_sf1.txt"

echo "== [5/6] sustained streaming bench -> SUSTAINED_${RR}.json"
require_solo
python scripts/sustained_stream_bench.py 2>/dev/null | tail -1 \
  > "SUSTAINED_${RR}.json.tmp"
finish "SUSTAINED_${RR}.json"
head -c 300 "SUSTAINED_${RR}.json"; echo

echo "== [6/6] bench at sf1 -> BENCH_sf1_${RR}.json"
require_solo
SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py 2>/dev/null | tail -1 \
  > "BENCH_sf1_${RR}.json.tmp"
finish "BENCH_sf1_${RR}.json"
head -c 300 "BENCH_sf1_${RR}.json"; echo

echo "== all evidence written for ${RR}"
