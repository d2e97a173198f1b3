#!/usr/bin/env bash
# Full test suite, parallel (pytest-xdist, one worker per core).
#
# --dist loadfile keeps each test FILE on one worker, preserving the
# module-scoped fixtures (reference model dirs, golden dumps).  The round-1
# in-process leak (one pytest process segfaulting near the end of the suite)
# no longer reproduces — `python -m pytest tests/ -q` has been green since
# round 2 — and xdist workers are separate processes anyway, so each carries
# at most a quarter of the suite's JAX/torch state.
#
# Usage: ./run_tests.sh [extra pytest args...]
set -u
cd "$(dirname "$0")"

exec python -m pytest tests/ -q -p no:cacheprovider \
    -n "${PYTEST_WORKERS:-$(nproc)}" --dist loadfile "$@"
