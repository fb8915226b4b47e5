#!/bin/bash
# Pre-snapshot gate: the FULL test suite must be green before any commit
# that registers a new query or ends a round. Round 12 shipped red because
# a newly-registered query's family spec was run but the full suite was
# not — QueriesSmokeSpec's plan-audit gate (which covers EVERY registered
# query, including plan shape) only fires on a full run.
#
# Usage: tools/preflight.sh            # full suite (the gate)
# Exit 0 = safe to snapshot; anything else = DO NOT COMMIT the round.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
echo "[preflight] running FULL sbt test (the snapshot gate)..." >&2
# sbt's own exit status is authoritative alongside the log greps: a
# future sbt output-format change must not let the greps vouch for (or
# damn) a run the build tool itself judged differently
SBT_EXIT=0
sbt -batch test > /tmp/graft_preflight.log 2>&1 || SBT_EXIT=$?
grep -E "^\[(error|info)\] (Tests:|.*FAILED)" /tmp/graft_preflight.log >&2 || :
if [ "$SBT_EXIT" -ne 0 ]; then
  echo "[preflight] RED — sbt test exited $SBT_EXIT (see /tmp/graft_preflight.log)" >&2
  exit 1
fi
if grep -qE "^\[error\]|Tests: .* failed [1-9]" /tmp/graft_preflight.log; then
  echo "[preflight] RED — fix before snapshot (see /tmp/graft_preflight.log)" >&2
  exit 1
fi
if ! grep -q "All tests passed" /tmp/graft_preflight.log; then
  echo "[preflight] suite did not report 'All tests passed' — treat as RED" >&2
  exit 1
fi
echo "[preflight] GREEN — safe to snapshot" >&2
