#!/bin/bash
# Full oracle-checked correctness sweep at the factor-10 (sf1) rehearsal
# scale. Shared logic in scale_sweep.sh (also backs sf10_sweep.sh).
# Output: CORRECTNESS_SF1.json in the repo root.
exec "$(dirname "$0")/scale_sweep.sh" 10 /tmp/graft-sf1 CORRECTNESS_SF1.json "$@"
