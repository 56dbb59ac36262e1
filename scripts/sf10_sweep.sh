#!/bin/bash
# Full oracle-checked correctness sweep at the factor-100 (sf10) rehearsal
# scale — the scale the bench rehearses (BENCH_SUBSET.json) but round 9
# only wall-clocked. The sf1 sweep caught two real scale defects the bench
# alone missed; this closes the sf1 -> sf10 verification gap (VERDICT r09
# item 2). Output: CORRECTNESS_SF10.json (same shape as the driver's
# CORRECTNESS_r{N}.json).
# Usage: sf10_sweep.sh [srcSfDir]   (factor is fixed at 100)
if [ $# -gt 1 ] || { [ $# -eq 1 ] && [ ! -d "$1" ]; }; then
  echo "usage: sf10_sweep.sh [srcSfDir]  (factor is fixed at 100)" >&2
  exit 2
fi
exec "$(dirname "$0")/scale_sweep.sh" 100 /tmp/graft-sf10 CORRECTNESS_SF10.json "$@"
