#!/bin/bash
# Dev-only: dump selected queries via graft.Verify at $SF, then run the
# check_correctness.py mirror against the DuckDB oracle.
# Usage: scripts/check_new.sh <prefix[,prefix...]>
set -e
SF=${SF:-/root/testdata/sf0.001}
OUT=${OUT:-/tmp/graft_check}
rm -rf "$OUT"; mkdir -p "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT ${1:-}" >/tmp/verify_run.log 2>&1 || {
  tail -30 /tmp/verify_run.log; exit 1; }
grep '\[verify\]' /tmp/verify_run.log || true
python3 scripts/check_correctness.py "$OUT" "$SF" "${1%%,*}"
