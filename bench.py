"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed end-to-end (plan + execute + count-style action);
a warm-up query absorbs one-time JVM/codegen cost so numbers reflect
steady-state throughput.
"""

from __future__ import annotations

import json
import os
import time

from ecommerce_data_engineering_spark.plans import REGISTRY
from ecommerce_data_engineering_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    bench_queries = {n: s for n, s in REGISTRY.items() if s.bench}

    timings: dict[str, float] = {}
    for name, spec in bench_queries.items():
        # Warm run (untimed): whole-stage-codegen compilation + parquet
        # footer caches — we report steady-state throughput, the number
        # that scales; first-run Janino compile is a constant, not a
        # per-byte cost.  Then min of two timed runs: this box is
        # shared, and a single sample occasionally eats a multi-second
        # scheduling/GC stall that says nothing about the plan.
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # noop sink materializes every row JVM-side, no driver collect
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)
        # queries may persist intermediates (e.g. LSH shingles); drop
        # them so later queries aren't measured under cache pressure
        spark.catalog.clearCache()

    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
