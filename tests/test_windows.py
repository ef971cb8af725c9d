"""Semantic checks for the window/approx extension queries (the oracle
diff already covers value parity; these assert the semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_engineering_spark.plans import REGISTRY


def test_approx_distinct_within_rsd(spark, sf_dir):
    """r4 contract: the query itself computes the |approx−exact|/exact
    ≤ 5 % check and surfaces it as within_5pct, next to the exact
    count — assert the flag holds and the exact column is truly exact."""
    rows = {r.event_type: r for r in
            REGISTRY["approx_distinct_users"].fn(spark, sf_dir).collect()}
    from ecommerce_data_engineering_spark.sources import load
    exact = {r.event_type: r.exact for r in
             load(spark, sf_dir, "events")
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact")).collect()}
    assert set(rows) == set(exact) and rows
    for et, r in rows.items():
        assert r.within_5pct == 1, (et, r)
        assert r.exact_users == exact[et], (et, r.exact_users, exact[et])


def test_rolling_window_is_trailing(spark, sf_dir):
    rows = (REGISTRY["rolling_7day_revenue"].fn(spark, sf_dir)
            .orderBy("sales_date").limit(8).collect())
    # first row: window of 1; growing to 7
    assert rows[0].days_in_window == 1
    assert rows[min(6, len(rows) - 1)].days_in_window == min(7, len(rows))
    assert abs(rows[0].revenue_7d - rows[0].revenue) < 1e-9


def test_quartiles_balanced(spark, sf_dir):
    q = (REGISTRY["customer_value_quartiles"].fn(spark, sf_dir)
         .groupBy("value_quartile").count().collect())
    counts = {r.value_quartile: r["count"] for r in q}
    assert set(counts) == {1, 2, 3, 4}
    assert max(counts.values()) - min(counts.values()) <= 1


def test_rollup_has_grand_total(spark, sf_dir):
    df = REGISTRY["revenue_rollup"].fn(spark, sf_dir)
    grand = df.filter(F.col("order_year").isNull()
                      & F.col("order_quarter").isNull()).collect()
    assert len(grand) == 1
    from ecommerce_data_engineering_spark.sources import load
    assert grand[0].n_orders == load(spark, sf_dir, "orders").count()
