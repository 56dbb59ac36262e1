#!/bin/bash
# Full oracle-checked correctness sweep at the sf1 rehearsal scale.
#
# Round 7 left the sf1/sf10 ScaleUp slices BENCH-ONLY: the old per-copy token
# tags broke the SimHashOracle <=8-byte token contract. ScaleUp now applies
# tags tag-then-truncate (tokens stay ASCII and <=8 bytes), so the ENTIRE
# DuckDB oracle sweep runs against the scaled slice too — the 10x-of-largest-
# driver-SF scale story becomes hash-checked, not wall-clock-only.
#
# Usage: scripts/sf1_sweep.sh [srcSf=/root/testdata/sf0.1] [factor=10]
# Output: CORRECTNESS_SF1.json in the repo root (same shape as the driver's
#         CORRECTNESS_r{N}.json), plus the raw compare log on stdout.
set -euo pipefail
cd "$(dirname "$0")/.."

SRC="${1:-/root/testdata/sf0.1}"
FACTOR="${2:-10}"
SLICE=/tmp/graft-sf1
OUT=/tmp/v_sf1

# regenerate unless a COMPLETE slice for exactly this (src, factor) exists:
# the marker is written only after ScaleUp finishes, so a crashed partial
# generation (or a previous run at a different scale) can never be silently
# reused as "the" slice
MARKER="$SLICE/.scaleup-complete"
WANT="src=$SRC factor=$FACTOR"
if [ ! -f "$MARKER" ] || [ "$(cat "$MARKER")" != "$WANT" ]; then
  rm -rf "$SLICE"
  sbt -batch "runMain graft.tools.ScaleUp $SRC $SLICE $FACTOR"
  echo "$WANT" > "$MARKER"
fi

# Re-assert the corpus contracts the oracles rely on, ON THE SLICE ITSELF
# (DedupSpec pins them on the driver SFs; a ScaleUp regression must fail
# here, not as an inscrutable simhash hash-mismatch 150 queries later):
#  - every document token <= 8 ASCII bytes (SimHashOracle replays only
#    XXH64's short path),
#  - event_ids dense 0..N-1 (the log-bootstrap offset==event_id alignment).
python3 - "$SLICE" <<'EOF'
import duckdb, sys
d = sys.argv[1]
con = duckdb.connect()
mx = con.execute(f"""
  SELECT max(octet_length(encode(tok)))
  FROM (SELECT unnest(regexp_split_to_array(text,' +')) AS tok
        FROM read_parquet('{d}/documents.parquet/*.parquet'))""").fetchone()[0]
assert mx <= 8, f"token contract violated: max token {mx} bytes > 8"
lo, hi, n = con.execute(f"""
  SELECT min(event_id), max(event_id), count(*)
  FROM read_parquet('{d}/events.parquet/*.parquet')""").fetchone()
assert lo == 0 and hi == n - 1, f"event_ids not dense: min={lo} max={hi} n={n}"
#  - (ts, event_id) order agrees with event_id order globally: EventFeed
#    replays by ts and the log bootstrap assigns dense arrival offsets, so
#    offset==event_id needs this co-ordering (ScaleUp shifts ts per copy
#    to extend the timeline rather than interleave it)
bad = con.execute(f"""
  SELECT count(*) FROM (
    SELECT event_id, row_number() OVER (ORDER BY ts, event_id) - 1 AS rn
    FROM read_parquet('{d}/events.parquet/*.parquet')) WHERE event_id <> rn
""").fetchone()[0]
assert bad == 0, f"ts order diverges from event_id order on {bad} rows"
print(f"slice contracts OK: max token {mx} bytes, {n} dense ts-ordered event_ids")
EOF

SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Verify $SLICE $OUT"

python3 scripts/check.py "$OUT" "$SLICE" --json CORRECTNESS_SF1.json
