#!/usr/bin/env bash
# Preflight gate for any commit that touches src/ — refuses to let a
# non-compiling tree become a snapshot. Born of rounds 10–11, both lost to a
# single missing import that a 30-second compile check would have caught.
#
# Usage:
#   tools/preflight.sh          # compile gate only (fast, ~60s warm)
#   tools/preflight.sh --test   # compile + full scalatest suite (~10 min)
#
# Exit 0  => safe to commit.
# Exit 1  => DO NOT COMMIT. Fix the errors first.
#
# Intended discipline (documented in BASELINE.md): run this before EVERY
# commit whose diff includes src/, and unconditionally before the
# end-of-round snapshot commit.
set -u
cd "$(dirname "$0")/.."

echo "[preflight] sbt -batch compile Test/compile ..." >&2
if ! sbt -batch compile Test/compile >/tmp/preflight_compile.log 2>&1; then
  echo "[preflight] COMPILE FAILED — refusing. Errors:" >&2
  grep -E '^\[error\]' /tmp/preflight_compile.log | head -20 >&2
  exit 1
fi
echo "[preflight] compile green." >&2

if [ "${1:-}" = "--test" ]; then
  echo "[preflight] sbt -batch test ..." >&2
  if ! sbt -batch test >/tmp/preflight_test.log 2>&1; then
    echo "[preflight] TESTS FAILED — refusing. Tail:" >&2
    grep -E 'FAILED|\*\*\*' /tmp/preflight_test.log | head -20 >&2
    exit 1
  fi
  echo "[preflight] tests green." >&2
fi

echo "[preflight] OK — safe to commit." >&2
exit 0
