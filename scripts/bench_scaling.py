"""Scaling evidence: run the headline queries at every fixture scale
(sf0.001 / sf0.01 / sf0.1 — 100x row-count spread) and print one JSON
object {sf: {query: median_sec}} plus the 0.01→0.1 ratio per query.

What "good" looks like on local[32]: at these sizes runtime is
dominated by fixed per-stage overhead, so a 10x data step should cost
much less than 10x wall clock (the plans are shuffle-light and
pushdown-friendly); a query whose ratio approaches the data ratio has
a scan- or shuffle-bound stage worth inspecting with .explain before
it meets real data.  Results are recorded in SCALE.md.

Optional args remap an sf label to a different directory, e.g.

    python scripts/bench_scaling.py 0.1=/tmp/sf0.1_rg8

to measure the 0.01→0.1 step against the multi-row-group copy from
``make_rowgrouped_fixture.py`` (r4 VERDICT #5: the stock sf0.1
fixtures are single-row-group, so scan-bound queries decode on one
core and the ratio conflates plan cost with single-thread decode).
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

SFS = ["0.001", "0.01", "0.1"]
N = 3


def main() -> None:
    overrides = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    spark = get_spark("bench_scaling")
    names = [n for n, s in REGISTRY.items() if s.bench]
    out: dict[str, dict[str, float]] = {}
    for sf in SFS:
        sf_dir = overrides.get(sf, f"/root/testdata/sf{sf}")
        times: dict[str, float] = {}
        for name in names:
            fn = REGISTRY[name].fn
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples = []
            for _ in range(N):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            times[name] = round(statistics.median(samples), 3)
            spark.catalog.clearCache()
        out[sf] = times
    ratios = {n: round(out["0.1"][n] / max(out["0.01"][n], 1e-9), 2)
              for n in names}
    print(json.dumps({"per_sf": out, "ratio_0.01_to_0.1_data_x10": ratios}))
    spark.stop()


if __name__ == "__main__":
    main()
