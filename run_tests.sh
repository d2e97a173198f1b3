#!/usr/bin/env bash
# Run the full test suite with per-file process isolation.
#
# Rationale: ~160 jit-heavy tests (JAX CPU backend + torch reference oracles)
# in ONE process accumulate host memory / XLA client state and eventually
# segfault near the end of the suite (round-1 VERDICT "What's weak" #1).
# Until the in-process leak is gone, each test file runs in its own pytest
# process; a file-level failure fails the whole run.
#
# Usage: ./run_tests.sh [extra pytest args...]
set -u
cd "$(dirname "$0")"

pass=0
fail=0
failed_files=()
start=$(date +%s)
for f in tests/test_*.py; do
  if timeout 1200 python -m pytest "$f" -q -x --no-header -p no:cacheprovider "$@"; then
    pass=$((pass + 1))
  else
    fail=$((fail + 1))
    failed_files+=("$f")
  fi
done
elapsed=$(( $(date +%s) - start ))
echo "=================================================================="
echo "run_tests.sh: ${pass} files passed, ${fail} files failed (${elapsed}s)"
if [ "$fail" -ne 0 ]; then
  printf 'FAILED: %s\n' "${failed_files[@]}"
  exit 1
fi
