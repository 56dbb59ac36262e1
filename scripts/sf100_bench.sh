#!/bin/bash
# Factor-1000 (sf100) scale rehearsal — one decade beyond the oracle-checked
# sf10 sweep, two beyond the driver's largest SF. Purpose: extend the
# measured scaling curve (sf0.01 -> sf0.1 -> sf1 -> sf10) one more decade so
# the 100 TB extrapolation rests on THREE order-of-magnitude steps, not two.
# The ~20 GB slice is bench-only (no oracle: DuckDB compare at this size is
# out of the harness envelope; correctness at scale is carried by the
# hash-checked sf1/sf10 sweeps over the same generator).
#
# Protocol mirrors the sf10 rehearsal (BASELINE.md round-9 section): the
# shuffle-heavy watch-list, median-of-3 with the bench's pass-budget
# degradation, warmup at sf0.001. Output preserved as BENCH_SF100.json
# (the bench writes subset runs to BENCH_SUBSET.json; copy so the sf10 and
# sf100 records can coexist).
set -euo pipefail
cd "$(dirname "$0")/.."

SLICE="${SLICE:-/tmp/graft-sf100}"
SRC="${SRC:-/root/testdata/sf0.1}"

. "$(dirname "$0")/lib_slice.sh"
ensure_slice "$SRC" "$SLICE" 1000

# The sf10 watch-list (BASELINE.md round-9): every shuffle/scale-critical
# family — agg, dim join, winnowing, prefix-sum pack, term-keyed retrieval
# stats, LSH + cluster dedup families, banded editdist stand-in (redact),
# line dedup both forms, ANN (ivf/hnsw), the q_curate flagship, tpch1.
SUBSET="q_agg,q_join3,q_windup,q_pack,q_bm25,q_tfidf,q_dupgroups,q_minhash_lsh,q_dedup_incr,q_contamination,q_redact,q_linededup,q_linededup_agg,q_hnsw,q_curate,q_tpch1,q_ivf"

SPARK_GRAFT_SF_DIR="$SLICE" \
SPARK_GRAFT_CPUS=32 \
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-96g}" \
SPARK_GRAFT_BENCH_PASSES=3 \
SPARK_GRAFT_BENCH_BUDGET_SEC="${SPARK_GRAFT_BENCH_BUDGET_SEC:-5400}" \
SPARK_GRAFT_BENCH_ONLY="$SUBSET" \
  sbt -batch "runMain graft.Bench"

cp BENCH_SUBSET.json BENCH_SF100.json
echo "wrote BENCH_SF100.json"
