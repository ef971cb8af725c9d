"""Per-query PLAN-CONSTRUCTION cost (min-of-N wall of ``spec.fn()``,
no action) — the r11 measurement that exposed the py4j boundary at
construction: bench.py's timed region includes ``spec.fn()``, and at
sf0.1 building the plan (py4j round-trips + eager per-op analysis) was
~1/3 of the whole bench wall.

Usage: run from ANY checkout (a git worktree of an older commit works —
the repo root is derived from this file's location), alternate trees
A/B/A/B across sessions and compare min-of-runs to cancel episodic box
noise.  Prints one JSON line.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ecommerce_data_engineering_spark.session import get_spark
from ecommerce_data_engineering_spark.plans import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("CONSTRUCT_N", "7"))


def main():
    spark = get_spark("construct-bench")
    bench = {n: s for n, s in REGISTRY.items() if s.bench}
    # warm: schema memo, first-construction memos, JVM paths
    for _ in range(2):
        for name, spec in bench.items():
            spec.fn(spark, SF_DIR)
    out = {}
    for name, spec in bench.items():
        ts = []
        for _ in range(N):
            t0 = time.perf_counter()
            spec.fn(spark, SF_DIR)
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts), 4)
    print(json.dumps({"repo": REPO, "n": N,
                      "total": round(sum(out.values()), 3),
                      "queries": out}))


if __name__ == "__main__":
    main()
