"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed end-to-end (plan + execute + count-style action);
a warm-up query absorbs one-time JVM/codegen cost so numbers reflect
steady-state throughput.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import time

from ecommerce_data_engineering_spark.plans import REGISTRY
from ecommerce_data_engineering_spark.session import get_spark

N_SAMPLES = 3


def _prev_bench() -> dict | None:
    """Latest committed BENCH_r{N}.json, for round-over-round deltas."""
    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not paths:
        return None
    try:
        with open(paths[-1]) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return None
    # the driver wraps this script's JSON line under "parsed"
    if isinstance(data.get("parsed"), dict):
        return data["parsed"]
    return data


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    bench_queries = {n: s for n, s in REGISTRY.items() if s.bench}

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name, spec in bench_queries.items():
        # Warm run (untimed): whole-stage-codegen compilation + parquet
        # footer caches — we report steady-state throughput, the number
        # that scales; first-run Janino compile is a constant, not a
        # per-byte cost.  Then MEDIAN of three timed runs (this box is
        # shared; a lone sample can eat a multi-second scheduling/GC
        # stall that says nothing about the plan), with max−min kept as
        # the noise bar so a regression is distinguishable from jitter.
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(N_SAMPLES):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # noop sink materializes every row JVM-side, no driver collect
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        spread[name] = round(max(samples) - min(samples), 3)
        # queries may persist intermediates (e.g. LSH shingles); drop
        # them so later queries aren't measured under cache pressure
        spark.catalog.clearCache()

    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_samples": N_SAMPLES,
        "spread": spread,
    }
    prev = _prev_bench()
    if prev and prev.get("sf") == out["sf"] and prev.get("queries"):
        out["delta_vs_prev"] = {
            n: round(timings[n] - prev["queries"][n], 3)
            for n in timings if n in prev["queries"]
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
