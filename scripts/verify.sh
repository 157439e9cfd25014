#!/usr/bin/env bash
# Correctness drive with the watchdog ENGAGED BY DEFAULT.
#
# Usage: scripts/verify.sh [sfDir] [outDir]
#
# SPARK_GRAFT_QUERY_BUDGET_S bounds each query's wall time (watchdog
# cancels the job group AND interrupts the worker thread, removes the
# partial output, and the drive continues). Verify itself defaults to
# 120 s when the var is unset, so the gate holds even when the driver
# invokes `runMain graft.Verify` directly; this script just makes the
# setting visible and overridable.
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-target/verify_out}"
export SPARK_GRAFT_QUERY_BUDGET_S="${SPARK_GRAFT_QUERY_BUDGET_S:-120}"
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
python3 scripts/check.py "$SF_DIR" "$OUT_DIR"
