#!/usr/bin/env bash
# Registry-wide runtime gate: every SparkEntry.queries entry at sf0.001
# under a 30 s/query ceiling; exits 1 naming offenders. Run before any
# commit that touches a query — this is the tripwire that would have
# caught the round-6 lt2 O(n²) regression in seconds.
#
# Usage: scripts/tripwire.sh [sfDir]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.001}"
export SPARK_GRAFT_TRIPWIRE_BUDGET_S="${SPARK_GRAFT_TRIPWIRE_BUDGET_S:-30}"
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Tripwire $SF_DIR"
