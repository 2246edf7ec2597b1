#!/usr/bin/env bash
# End-of-round wrap gate: NO snapshot commit may land without this passing.
#
#   scripts/wrap.sh            # Test/compile + full sf0.001 gate (~5 min)
#   scripts/wrap.sh --fast     # Test/compile only (~30 s)
#
# Exit 0 = safe to commit. Any red build or gate failure exits non-zero.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[wrap] sbt Test/compile ..."
sbt -batch Test/compile

if [[ "${1:-}" != "--fast" ]]; then
  OUT=/tmp/wrap_vout
  rm -rf "$OUT"
  echo "[wrap] Verify dump at sf0.001 ..."
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 $OUT"
  echo "[wrap] check.py gate ..."
  RES=$(python3 scripts/check.py /root/testdata/sf0.001 "$OUT" | tail -1)
  echo "[wrap] $RES"
  echo "$RES" | grep -q " 0 failed" || { echo "[wrap] GATE RED — do not commit"; exit 1; }
fi
echo "[wrap] GREEN — safe to commit"
