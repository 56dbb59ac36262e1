#!/bin/bash
# Shared oracle-checked correctness sweep at a ScaleUp rehearsal scale.
# Callers: sf1_sweep.sh (factor 10 -> CORRECTNESS_SF1.json) and
# sf10_sweep.sh (factor 100 -> CORRECTNESS_SF10.json).
#
# Usage: scripts/scale_sweep.sh <factor> <sliceDir> <outJson> [srcSf]
#
# Regenerates the slice unless a COMPLETE one for exactly (src, factor)
# exists (marker written only after ScaleUp finishes, so a crashed partial
# generation can never be silently reused), re-asserts the corpus contracts
# the oracles rely on ON THE SLICE ITSELF, runs the full Verify dump, and
# oracle-compares every declared query with scripts/check.py.
set -euo pipefail
cd "$(dirname "$0")/.."

FACTOR="${1:?factor}"
SLICE="${2:?sliceDir}"
OUTJSON="${3:?outJson}"
SRC="${4:-/root/testdata/sf0.1}"
OUT="${SLICE}-verify"

. "$(dirname "$0")/lib_slice.sh"
ensure_slice "$SRC" "$SLICE" "$FACTOR"

# Corpus contracts (DedupSpec pins them on driver SFs; a ScaleUp regression
# must fail here, not as an inscrutable hash-mismatch 150 queries later):
#  - every document token <= 8 ASCII bytes (SimHashOracle's XXH64 short path),
#  - event_ids dense 0..N-1 and (ts, event_id)-co-ordered (offset==event_id
#    alignment for the log bootstrap + EventFeed replay order).
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
bad = con.execute(f"""
  SELECT count(*) FROM (
    SELECT event_id, row_number() OVER (ORDER BY ts, event_id) - 1 AS rn
    FROM read_parquet('{d}/events.parquet/*.parquet')) WHERE event_id <> rn
""").fetchone()[0]
assert bad == 0, f"ts order diverges from event_id order on {bad} rows"
print(f"slice contracts OK: max token {mx} bytes, {n} dense ts-ordered event_ids")
EOF

# Driver heap sized for the largest slice: the factor-100 streaming replays
# materialize the 10M-row feed driver-side (inside the documented replay
# envelope), and Verify coalesces each result to one file.
# SWEEP_SUBSET (comma-separated query names, optional): restrict the dump
# and the compare to a subset. Used by sf100_sweep.sh, where the excluded
# families (streaming replays, quadratic DuckDB oracles) are out of the
# one-box compare envelope; the full-registry sweeps (sf1/sf10) leave it
# unset.
# DIGEST_SUBSET (comma-separated, optional): names compared in check.py's
# digest mode (order-independent count + row-hash sum computed by DuckDB
# over both sides) instead of the pandas row-compare — the row-preserving
# >~20M-row outputs whose frames exceed the row-compare harness. Digest
# names are dumped without the coalesce(1) single-file write (the
# single-threaded write would dominate the sweep at 100M+ rows).
NAMES="${SWEEP_SUBSET:+$(echo "$SWEEP_SUBSET" | tr ',' ' ')}"
DIGEST_NAMES="${DIGEST_SUBSET:+$(echo "$DIGEST_SUBSET" | tr ',' ' ')}"

SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_VERIFY_COALESCE="${DIGEST_SUBSET:+0}" \
  sbt -batch "runMain graft.Verify $SLICE $OUT $NAMES $DIGEST_NAMES"

python3 scripts/check.py "$OUT" "$SLICE" --json "$OUTJSON" \
  ${DIGEST_SUBSET:+--digest "$DIGEST_SUBSET"} $NAMES $DIGEST_NAMES
