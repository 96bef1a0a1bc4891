#!/usr/bin/env bash
# Round-end snapshot guard (VERDICT r8 item 7).
#
# Run this BEFORE declaring a round done. It fails if any tracked
# judged artifact (BENCH*.json, LEAKCHECK.json, CORRECTNESS*.json,
# SCALING.md) or source file is modified-but-uncommitted, so the
# round-final commit always contains the bench that was actually
# judged. Driver-written post-commit files (BENCH_r{N}.json /
# CORRECTNESS_r{N}.json for the CURRENT round) are expected to be
# untracked and are ignored.
set -euo pipefail
cd "$(dirname "$0")/.."

dirty=$(git status --porcelain | grep -v '^??' || true)
if [[ -n "$dirty" ]]; then
  echo "SNAPSHOT GUARD: modified tracked files — commit before snapshotting:" >&2
  echo "$dirty" >&2
  exit 1
fi

# Untracked files other than driver-written round artifacts are suspicious.
# cut -c4- (not awk) so filenames containing spaces survive intact
untracked=$(git status --porcelain | grep '^??' | cut -c4- \
  | grep -Ev '^(BENCH_r[0-9]+\.json|CORRECTNESS_r[0-9]+\.json|target/|\.bsp/)' || true)
if [[ -n "$untracked" ]]; then
  echo "SNAPSHOT GUARD: untracked non-driver files — add or ignore them:" >&2
  echo "$untracked" >&2
  exit 1
fi

echo "snapshot guard: clean tree — OK to end round"
