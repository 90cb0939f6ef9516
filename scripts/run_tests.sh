#!/bin/bash
# Canonical full-suite runner: one pytest process per test file, run through
# a bounded parallel job pool.
#
# Running all ~200 tests in a single process has repeatedly segfaulted
# late in the run inside XLA:CPU compilation (see conftest.py) — an
# accumulation flakiness, not a test failure: every crash site passes in a
# shorter process. Per-file processes sidestep it entirely. Extra
# interpreter/jax startup costs ~8 s per file; the suite is dominated by
# compile time either way.
#
# The per-file processes are independent, so they run LMDX_TEST_JOBS at a
# time (default: half the CPUs, ≥1). Each file's output is buffered and
# printed as a block when it finishes, so logs stay per-file readable.
# On a 1-CPU host this degrades to the previous serial behavior.
#
# Usage: scripts/run_tests.sh [extra pytest args, e.g. -m "not slow"]
set -u
cd "$(dirname "$0")/.."

ncpu=$(nproc 2>/dev/null || echo 1)
jobs=${LMDX_TEST_JOBS:-$(((ncpu + 1) / 2))}
[ "$jobs" -lt 1 ] && jobs=1

outdir=$(mktemp -d)
trap 'rm -rf "$outdir"' EXIT

run_one() {
  local f=$1
  shift
  local base
  base=$(basename "$f")
  {
    echo "=== $f"
    python -m pytest "$f" -q --tb=short "$@"
    local rc=$?
    # exit 5 = "no tests ran": the file was fully deselected by -m / -k —
    # that is not a failure of the suite.
    if [ "$rc" -ne 0 ] && [ "$rc" -ne 5 ]; then
      echo 1 > "$outdir/$base.fail"
    fi
  } > "$outdir/$base.log" 2>&1
}

# LMDX_TEST_FILES overrides the file list (space-separated), e.g. to rerun
# a failing subset under the same pool/log harness.
read -r -a all_files <<< "${LMDX_TEST_FILES:-$(echo tests/test_*.py)}"

pids=()
files=()
for f in "${all_files[@]}"; do
  run_one "$f" "$@" &
  pids+=($!)
  files+=("$f")
  # Bounded pool: once $jobs processes are in flight, wait for the oldest.
  # (Completion order is close to start order here, and waiting on the
  # oldest keeps the printed logs in deterministic file order.)
  if [ "${#pids[@]}" -ge "$jobs" ]; then
    wait "${pids[0]}"
    cat "$outdir/$(basename "${files[0]}").log"
    pids=("${pids[@]:1}")
    files=("${files[@]:1}")
  fi
done
for i in "${!pids[@]}"; do
  wait "${pids[$i]}"
  cat "$outdir/$(basename "${files[$i]}").log"
done

if ls "$outdir"/*.fail > /dev/null 2>&1; then
  echo "FAILURES (see above)"
  exit 1
fi
echo "ALL FILES PASSED"
