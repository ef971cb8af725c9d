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

N_SAMPLES = 3          # initial samples per query
MAX_SAMPLES = 7        # adaptive top-up ceiling for noisy queries
NOISE_FRAC = 0.30      # resample while range > 30% of the median


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
    floors: dict[str, float] = {}
    spread: dict[str, float] = {}
    n_used: dict[str, int] = {}
    for name, spec in bench_queries.items():
        # Warm run (untimed): whole-stage-codegen compilation + parquet
        # footer caches — we report steady-state throughput, the number
        # that scales; first-run Janino compile is a constant, not a
        # per-byte cost.  Timed runs report the MEDIAN (this box is
        # shared; a lone sample can eat a multi-second scheduling/GC
        # stall that says nothing about the plan).
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        def _run() -> float:
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # noop sink materializes every row JVM-side, no driver collect
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        # Adaptive sampling (r2: embedding_ann_lsh's spread exceeded
        # its value because ONE of three samples ate a multi-second
        # scheduling stall): keep sampling while the range is > 30% of
        # the median, up to 7 samples.  The reported noise bar is the
        # range of the middle three sorted samples — a stall then
        # widens n_samples, not the bar; the median is stall-robust
        # either way.
        samples = [_run() for _ in range(N_SAMPLES)]
        while (max(samples) - min(samples)
               > NOISE_FRAC * statistics.median(samples)
               and len(samples) < MAX_SAMPLES):
            samples.append(_run())
        timings[name] = round(statistics.median(samples), 3)
        # the min is the stall-robust floor: this box takes intermittent
        # multi-second stalls that can cover a whole sampling window and
        # poison even a median-of-7; min >> median divergence flags it
        floors[name] = round(min(samples), 3)
        mid = sorted(samples)[(len(samples) - 3) // 2:][:3]
        spread[name] = round(max(mid) - min(mid), 3)
        n_used[name] = len(samples)
        # queries may persist intermediates (e.g. LSH shingles); drop
        # them so later queries aren't measured under cache pressure
        spark.catalog.clearCache()

    # The driver captures only the LAST ~2000 chars of stdout; r3's
    # single fat line (queries+n_samples+spread+min+delta for 22
    # queries) was truncated mid-object and BENCH_r03.json recorded
    # parsed:null.  Emit diagnostics FIRST (earlier line + sidecar
    # file), then ONE compact final line that always fits the window.
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        # contamination-robust companion total: sum of per-query MINIMA
        # (timeit-style best-observed).  When external box load covers a
        # whole sampling window, medians inflate together while minima
        # stay near the true cost — value >> value_min flags a
        # contaminated run rather than a plan regression.
        "value_min": round(sum(floors.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    detail = {
        **out,
        "n_samples": n_used,
        "spread": spread,
        "min": floors,
    }
    prev = _prev_bench()
    if prev and prev.get("sf") == out["sf"] and prev.get("queries"):
        detail["delta_vs_prev"] = {
            n: round(timings[n] - prev["queries"][n], 3)
            for n in timings if n in prev["queries"]
        }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(detail))          # full diagnostics, earlier line
    final = json.dumps(out, separators=(",", ":"))
    if len(final) > 1800:              # belt-and-braces: never outgrow
        out.pop("queries")             # the driver's tail window
        final = json.dumps(out, separators=(",", ":"))
    print(final)
    spark.stop()


if __name__ == "__main__":
    main()
