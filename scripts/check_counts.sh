#!/bin/bash
# Doc-count sync gate (VERDICT r10 item 7): the registry's machine truth
# (graft.tools.RegistryCounts) vs the claims written in SURVEY.md and
# README.md. Fails when any claimed count drifts from the registry, so
# adding a query without updating the docs (or vice versa) is caught by a
# script instead of a per-round hand audit.
#
# Claim anchors checked (all occurrences of each pattern must match):
#   SURVEY.md : "<N> queries,( ... )<M> oracle-checked" near §2.3.1,
#               "declares <N>\nqueries (<M> oracle-checked)"
#   README.md : "<N> declared queries", "<M> are hash-checked"
#
# Usage: scripts/check_counts.sh
set -euo pipefail
cd "$(dirname "$0")/.."

LINE=$(sbt -batch "runMain graft.tools.RegistryCounts" 2>/dev/null | grep '^\[counts\]')
echo "$LINE"
REG=$(sed -E 's/.*registry=([0-9]+).*/\1/' <<<"$LINE")
ORC=$(sed -E 's/.*oracle_checked=([0-9]+).*/\1/' <<<"$LINE")

fail=0
claim() { # claim <file> <regex-with-one-capture> <expected> <label>
  local f=$1 re=$2 want=$3 label=$4 got n=0
  # multi-line safe: collapse the file to one line first
  got=$(tr '\n' ' ' <"$f" | grep -oE "$re" | grep -oE '[0-9]+' | sort -u) || true
  [ -z "$got" ] && { echo "MISSING $f: no claim matching /$re/ ($label)"; fail=1; return; }
  for g in $got; do
    n=$((n + 1))
    if [ "$g" != "$want" ]; then
      echo "STALE   $f: claims $label=$g, registry says $want (/$re/)"
      fail=1
    fi
  done
  echo "ok      $f: $n claim(s) of $label=$want"
}

claim SURVEY.md 'declares [0-9]+ queries'            "$REG" "registry"
claim SURVEY.md 'queries \([0-9]+ oracle-checked\)'  "$ORC" "oracle-checked"
claim README.md '[0-9]+ declared queries'            "$REG" "registry"
claim README.md '[0-9]+ are hash-checked'            "$ORC" "oracle-checked"

# paired-claim form ("N queries, M oracle-checked" in §2.3.1's header):
# both numbers must match as a pair
pairs=$(tr '\n' ' ' <SURVEY.md | grep -oE '[0-9]+ queries, [0-9]+ oracle-checked' | sort -u) || true
while IFS= read -r p; do
  [ -z "$p" ] && continue
  if [ "$p" != "$REG queries, $ORC oracle-checked" ]; then
    echo "STALE   SURVEY.md: claims '$p', registry says '$REG queries, $ORC oracle-checked'"
    fail=1
  else
    echo "ok      SURVEY.md: paired claim '$p'"
  fi
done <<<"$pairs"

if [ "$fail" -ne 0 ]; then
  echo "check_counts: FAILED (docs out of sync with the registry)"
  exit 1
fi
echo "check_counts: docs agree with registry ($REG queries, $ORC oracle-checked)"
