#!/bin/bash
# Round-9 measurement phase — run ONLY on an otherwise idle box (after
# every correctness sweep has finished): concurrent sweeps poison the
# bench medians these records exist to pin.
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEMORY="${SPARK_DRIVER_MEMORY:-24g}"
: "${ROUND:?set ROUND to the current round number}"

echo "== Spark-side throughput (SCALE_BENCH) =="
python scripts/make_scale_bench.py

echo "== streaming soak incl. skewed-key leg (STREAM_BENCH) =="
python scripts/stream_throughput.py /tmp/sf_64x 32 --force --skew=/tmp/sf_skew16x

echo "== bucketed-join delta (BUCKET_BENCH) =="
python scripts/bucketed_join_bench.py /tmp/sf_64x

echo "== scaling ladder =="
python scripts/bench_scaling.py 0.1=/tmp/sf0.1_rg8

echo "== consecutive suspect-free bench pair =="
python scripts/bench_consec.py "$ROUND"

echo "== assert everything green and cited =="
python scripts/check_scale_evidence.py
