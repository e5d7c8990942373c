#!/bin/bash
# Local correctness loop: Verify at sf0.01 -> DuckDB oracle compare.
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft_verify}"
rm -rf "$OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -E '^\[error\]|verify\]' || true
python3 scripts/check.py "$SF" "$OUT"
# Optional plan-shape gate (GRAFT_PLAN_AUDIT=1): flags cartesians,
# unpartitioned windows, and non-allowlisted BNLJs across every query.
if [ -n "${GRAFT_PLAN_AUDIT:-}" ]; then
  sbt -batch "runMain graft.PlanAudit $SF" 2>&1 | grep -E '== audited|REGRESSION'
fi
