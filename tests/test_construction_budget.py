"""Driver-window plan-CONSTRUCTION latency guard (VERDICT r5 #8).

The r5 sign-LSH lesson: a query whose plan *construction* does
thousands of py4j round-trips (per-element Column building, eager
collects, repeated fixture analysis) can triple the bench/driver wall
time with an IDENTICAL expression tree — a regression no correctness
or plan-shape test sees.  This pins the whole driver window's cold
construction+analysis cost under one budget so the next such
regression fails here, locally, with the offender named.
"""

from __future__ import annotations

import time

import pytest

from ecommerce_data_engineering_spark.plans import DRIVER_WINDOW, REGISTRY

# Queries whose construction DELIBERATELY runs Spark jobs, by
# documented design, and is therefore budgeted separately:
# - pipeline_dim_customers_scd2 builds the full synthetic pipeline once
#   per session (plans/pipeline_queries._tables memo) — minutes of real
#   multi-stage work, driver-verified via its own CORRECTNESS row;
# - ingest_refresh_roundtrip / fact_orders_upsert / sql_api_* and the
#   dq_contract must-fail probe write/execute during construction but
#   stay small — they remain IN the budget; only the pipeline build is
#   excluded.
EAGER_EXCLUDED = {"pipeline_dim_customers_scd2"}

# Seconds for the 49 non-excluded window queries to construct AND
# analyze (df.schema forces analysis) on a COLD session (fresh
# newSession(): empty per-session relation memo, so fixture
# listing/schema inference is paid once per table like the driver's
# first pass).  Measured ~2x headroom over a loaded local[8] box.
BUDGET_S = 60.0


def _construct_window(spark, sf_dir):
    sess = spark.newSession()          # cold caches, warm JVM
    per: dict[str, float] = {}
    t0 = time.time()
    for name in list(REGISTRY)[:DRIVER_WINDOW]:
        if name in EAGER_EXCLUDED:
            continue
        t1 = time.time()
        df = REGISTRY[name].fn(sess, sf_dir)
        _ = df.schema                  # force analysis, no execution
        per[name] = round(time.time() - t1, 2)
    return time.time() - t0, per


@pytest.mark.timeout(600)
def test_driver_window_constructs_under_budget(spark, sf_dir):
    total, per = _construct_window(spark, sf_dir)
    if total >= BUDGET_S:
        # Wall clock on a shared box is contention-prone (r6: a boot-time
        # full-suite run tripped this while the same measurement passed in
        # isolation 2x under budget).  One retry on a fresh cold session
        # keeps transient load from failing the build while a REAL
        # construction-cost regression (the sign-LSH class was a ~3x jump)
        # still fails both passes.
        total, per = _construct_window(spark, sf_dir)
    worst = sorted(per.items(), key=lambda kv: -kv[1])[:5]
    assert total < BUDGET_S, (
        f"driver-window construction took {total:.1f}s (> {BUDGET_S}s) "
        f"on both of two passes; worst offenders: {worst}")
    # no single query may eat half the budget by itself — catches a
    # localized construction-cost regression even while the total
    # still squeaks under
    assert per[worst[0][0]] < BUDGET_S / 2, worst
