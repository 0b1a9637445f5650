#!/usr/bin/env bash
# Full-registry tri-scale correctness sweep: dumps every declared query
# at each scale factor and replays the driver's DuckDB-oracle gate.
# The expensive failures are SF-dependent (sort-key uniqueness, LSH
# banding recall), so a green sf0.01 alone is not "done" — run this
# before claiming a round clean. Usage: scripts/sweep.sh [sf ...]
set -euo pipefail
cd "$(dirname "$0")/.."
sfs=("$@")
[ $# -eq 0 ] && sfs=(0.001 0.01 0.1)
for sf in "${sfs[@]}"; do
  out="target/sweep_sf$sf"
  rm -rf "$out"
  echo "== sweep sf$sf"
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out" >/dev/null 2>&1 \
    || { echo "Verify FAILED at sf$sf"; exit 1; }
  python3 scripts/check.py "/root/testdata/sf$sf" "$out" | tail -1
done
