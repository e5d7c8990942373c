#!/bin/bash
# Local correctness loop: Verify -> DuckDB oracle compare.
#   check.sh                 one SF (sf0.01, the driver's gate)
#   check.sh all             ALL THREE SFs (sf0.001 + sf0.01 + sf0.1) —
#                            the full pre-commit gate: overflow headroom,
#                            hot-bucket caps, and AQE behaviors are
#                            SF-dependent (SURVEY §5), so one SF is not
#                            enough before a round lands.
#   check.sh <sfdir> [out]   explicit dir
set -e
cd "$(dirname "$0")/.."
if [ "${1:-}" = "all" ]; then
  rc=0
  for sf in sf0.001 sf0.01 sf0.1; do
    echo "=== $sf ==="
    bash "$0" "/root/testdata/$sf" "/tmp/graft_verify_$sf" || rc=1
  done
  exit $rc
fi
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
