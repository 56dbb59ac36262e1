#!/bin/bash
# Full oracle-checked correctness sweep at the factor-10 (sf1) rehearsal
# scale. Shared logic in scale_sweep.sh (also backs sf10_sweep.sh).
# Output: CORRECTNESS_SF1.json in the repo root.
# Usage: sf1_sweep.sh [srcSfDir]   (factor is fixed at 10 — extra args that
# look like a factor would otherwise be silently swallowed as srcSf)
if [ $# -gt 1 ] || { [ $# -eq 1 ] && [ ! -d "$1" ]; }; then
  echo "usage: sf1_sweep.sh [srcSfDir]  (factor is fixed at 10)" >&2
  exit 2
fi
exec "$(dirname "$0")/scale_sweep.sh" 10 /tmp/graft-sf1 CORRECTNESS_SF1.json "$@"
