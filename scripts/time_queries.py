"""Ad-hoc single-query timing: noop-sink wall clock for named registry
queries on a given fixture (guide §1.4).  Used for before/after probes
during optimization rounds — NOT an evidence artifact generator.

    python scripts/time_queries.py /tmp/sf_64x dedup_minhash_lsh corpus_decontaminate

Each query: 1 warmup + N timed runs (fresh plan each run — the plan is
rebuilt from load() so repeated runs cannot skip the scan stage), with
spark.catalog.clearCache() between runs (same hygiene as bench.py).
Prints one JSON object {query: {"min": s, "med": s, "runs": [...]}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_data_engineering_spark.plans import REGISTRY
from ecommerce_data_engineering_spark.session import get_spark

N = int(os.environ.get("TIMEQ_N", "5"))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    spark = get_spark("time_queries")
    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.catalog.clearCache()
        sc.setJobDescription(f"warmup: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(N):
            spark.catalog.clearCache()
            sc.setJobDescription(f"timed {i}: {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        out[name] = {"min": min(runs), "med": round(statistics.median(runs), 3),
                     "runs": runs}
        # progress to stderr so stdout stays one parseable JSON object
        # (ADVICE r11)
        print(f"  {name}: min {min(runs)} med {out[name]['med']}",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
