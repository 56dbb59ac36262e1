#!/bin/bash
# One-command evidence commit (VERDICT r12 item 8 — the fourth consecutive
# round opened with untracked BENCH_r{N}/CORRECTNESS_r{N} artifacts).
# Stages every round evidence file the driver or the build produces and
# commits them if anything changed. Safe to run repeatedly (no-op when
# clean).
#
# Usage: scripts/commit_evidence.sh [message]
set -euo pipefail
cd "$(dirname "$0")/.."

git add -A -- \
  'BENCH_r*.json' 'CORRECTNESS_r*.json' 'CORRECTNESS_SF*.json' \
  'BENCH_SF*.json' 'BENCH_FULL*.json' 'BENCH_SUMMARY*.json' \
  'LEAKCHECK.json' 'COPYCHECK.json' 'BASELINE.md' 'BASELINE.json' \
  'EVIDENCE_r*.md' 'VERDICT.md' 'ADVICE.md' 2>/dev/null || true

if git diff --cached --quiet; then
  echo "commit_evidence: nothing to commit (evidence files clean)"
  exit 0
fi

git commit -m "${1:-Record round evidence artifacts}"
echo "commit_evidence: committed"
