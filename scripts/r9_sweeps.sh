#!/bin/bash
# Round-9 evidence regeneration, split into parallel streams so the
# multi-hour embedding all-pairs oracles (stream C) overlap the
# ordinary correctness sweeps instead of serializing behind them.
# Correctness sweeps tolerate concurrency (results are deterministic;
# only wall-time columns get noisier) — measurement steps do NOT and
# run separately once the box is idle (scripts/r9_measure.sh).
set -uo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEMORY="${SPARK_DRIVER_MEMORY:-24g}"

stream_a() {
  python scripts/scale_correctness.py /tmp/sf_synth --all --bounded --force \
    > /tmp/sweep_synth.log 2>&1
  python scripts/scale_correctness.py /root/testdata/sf0.1 --all --bounded \
    --tag=sf01 --force > /tmp/sweep_sf01.log 2>&1
  python scripts/scale_correctness.py /tmp/sf_skew01 --all --bounded \
    --tag=skew --force > /tmp/sweep_skew.log 2>&1
  echo "stream_a done"
}

stream_b() {
  for s in 1 2 3; do
    python scripts/scale_correctness.py /tmp/sf_seed$s --all --bounded \
      --tag=seed$s --force > /tmp/sweep_seed$s.log 2>&1
  done
  python scripts/scale_correctness.py /tmp/sf_16x --bench --bounded \
    --tag=16x --force > /tmp/sweep_16x.log 2>&1
  python scripts/scale_correctness.py /tmp/sf_16x --bounded \
    --tag=16x_full --force > /tmp/sweep_16x_full.log 2>&1
  python - <<'EOF' > /tmp/b64.txt
from ecommerce_data_engineering_spark.plans import REGISTRY
names = sorted(n for n, s in REGISTRY.items() if s.bench
               and n not in ("fact_lineitem_build", "events_sessionization"))
print(",".join(names))
EOF
  python scripts/scale_correctness.py /tmp/sf_64x --only "$(cat /tmp/b64.txt)" \
    --bounded --tag=64x --force > /tmp/sweep_64x.log 2>&1
  python scripts/scale_correctness.py /tmp/sf_skew16x --bench --bounded \
    --tag=skew16x --force > /tmp/sweep_skew16x.log 2>&1
  echo "stream_b done"
}

stream_c() {
  # all SIX quadratic-oracle pair-emitters at 16x (VERDICT r8 #4);
  # dominated by the two embedding all-pairs DuckDB oracles
  python scripts/scale_correctness.py /tmp/sf_16x --all --bounded \
    --only dedup_clusters,dedup_jaccard_prefix,dedup_ngram_jaccard,dedup_simhash_pairs,dedup_embedding_cosine,dedup_embedding_clusters \
    --tag=16x_pairs --force > /tmp/sweep_16x_pairs.log 2>&1
  echo "stream_c done"
}

stream_d() {
  python scripts/ann_recall.py sf0.1=/root/testdata/sf0.1 16x=/tmp/sf_16x \
    > /tmp/recall.log 2>&1
  echo "stream_d done"
}

stream_a & A=$!
stream_b & B=$!
stream_c & C=$!
stream_d & D=$!
wait $A $B $C $D
echo "ALL_SWEEPS_DONE"
python scripts/check_scale_evidence.py || true
