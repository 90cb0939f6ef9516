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
# A non-integer override would error both bound checks below (no set -e), so
# the pool bound would never apply — validate and fall back to the default.
case $jobs in
  ''|*[!0-9]*) jobs=$(((ncpu + 1) / 2)) ;;
esac
[ "$jobs" -lt 1 ] && jobs=1

outdir=$(mktemp -d)
trap 'rm -rf "$outdir"' EXIT

# Artifacts are keyed by per-file index, not basename: a duplicated entry (or
# two paths sharing a basename) in LMDX_TEST_FILES must not race on one log.
run_one() {
  local key=$1 f=$2
  shift 2
  {
    echo "=== $f"
    python -m pytest "$f" -q --tb=short "$@"
    local rc=$?
    # exit 5 = "no tests ran": the file was fully deselected by -m / -k —
    # that is not a failure of the suite.
    if [ "$rc" -ne 0 ] && [ "$rc" -ne 5 ]; then
      echo 1 > "$outdir/$key.fail"
    fi
    # Success is proven, not assumed: a worker that dies before this line
    # (OOM-killed shell, redirect failure) leaves no .done marker and the
    # file is counted as failed below.
    touch "$outdir/$key.done"
  } > "$outdir/$key.log" 2>&1
}

# LMDX_TEST_FILES overrides the file list (space-separated), e.g. to rerun
# a failing subset under the same pool/log harness.
read -r -a all_files <<< "${LMDX_TEST_FILES:-$(echo tests/test_*.py)}"

pids=()
keys=()
i=0
for f in "${all_files[@]}"; do
  key="$i-$(basename "$f")"
  i=$((i + 1))
  run_one "$key" "$f" "$@" &
  pids+=($!)
  keys+=("$key")
  # Bounded pool: once $jobs processes are in flight, wait for the oldest.
  # (Completion order is close to start order here, and waiting on the
  # oldest keeps the printed logs in deterministic file order.)
  if [ "${#pids[@]}" -ge "$jobs" ]; then
    wait "${pids[0]}"
    cat "$outdir/${keys[0]}.log" 2>/dev/null
    pids=("${pids[@]:1}")
    keys=("${keys[@]:1}")
  fi
done
for j in "${!pids[@]}"; do
  wait "${pids[$j]}"
  cat "$outdir/${keys[$j]}.log" 2>/dev/null
done

failed=0
i=0
for f in "${all_files[@]}"; do
  key="$i-$(basename "$f")"
  i=$((i + 1))
  if [ -e "$outdir/$key.fail" ]; then
    echo "FAILED: $f"
    failed=1
  elif [ ! -e "$outdir/$key.done" ]; then
    echo "DIED (no result): $f"
    failed=1
  fi
done
if [ "$failed" -ne 0 ]; then
  echo "FAILURES (see above)"
  exit 1
fi
echo "ALL FILES PASSED"
