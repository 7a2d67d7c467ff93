#!/bin/bash
# Repeatable full-catalog oracle sweep at sf0.1 (r11 verdict #4): the
# r11 cross-SF sweep caught an audit fragility three rounds of
# sf0.01-only gating missed, so the bench-scale replay is now a
# committed, re-runnable artifact (tools/sweep_sf01.jsonl), not a
# one-off. Engine dump ~3 min; the DuckDB replay of the all-pairs
# oracles is the slow leg (~45 min — the oracle's cost, not the
# engine's).
#
# Usage: tools/sweep_sf01.sh [verify_out_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${SWEEP_SF_DIR:-/root/testdata/sf0.1}
OUT=${1:-/tmp/graft_verify_sf01}
rm -rf "$OUT"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $SF $OUT"
SWEEP_JSONL=tools/sweep_sf01.jsonl python3 tools/check.py "$SF" "$OUT"
