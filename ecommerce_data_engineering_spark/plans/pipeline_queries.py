"""Driver-visible entries for the full e-commerce pipeline
(pipeline.py over the seeded synthetic source — SURVEY.md §3).

These are rows-only checks: the generator + multi-stage pipeline is
deterministic Spark code but not expressible as a single ANSI SQL
statement, so the driver records the weaker check (per contract);
the structural invariants are asserted in tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import run_pipeline
from ..sources.synthetic import generate_ecommerce
from .registry import query

_CACHE: dict[str, dict[str, DataFrame]] = {}


def _tables(spark: SparkSession) -> dict[str, DataFrame]:
    # keyed by applicationId, not id(spark): Python id() values can be
    # recycled after GC, which would hand a new session DataFrames bound
    # to a stopped one
    key = spark.sparkContext.applicationId
    if key not in _CACHE:
        _CACHE[key] = run_pipeline(spark, generate_ecommerce(spark, scale=0.05),
                                   as_of="2024-07-09")
    return _CACHE[key]


@query(
    "pipeline_dim_customers_scd2",
    # The synthetic source is a pure function of the row id and the
    # pipeline's initial SCD2 load is deterministic, so the whole dim
    # has a closed form DuckDB can rebuild from generate_series: the
    # generator's column expressions (sources/synthetic.customers),
    # staging's email lower+trim / segment fill (stage_customers), the
    # initial-load SCD2 literals, and first-sight surrogate keys
    # (row_number over customer_id ≡ id+1).  Full row-level hash check
    # for S8+M1 instead of the r2 rows-only record.
    oracle="""
    WITH g AS (
      SELECT CAST(i AS BIGINT) AS i FROM generate_series(0, 124) AS t(i)
    )
    SELECT printf('CUST_%06d', i) AS customer_id,
           'First' || CAST(i % 997 AS VARCHAR) || ' ' ||
             'Last' || CAST(i % 499 AS VARCHAR) AS full_name,
           lower(trim(CASE WHEN i % 17 = 0
                           THEN printf('  FIRST.LAST%d@GMAIL.COM  ', i)
                           ELSE printf('first.last%d@gmail.com', i) END))
             AS email,
           COALESCE(CASE WHEN i % 97 = 0 THEN NULL
                         WHEN i % 10 < 2 THEN 'Premium'
                         WHEN i % 10 < 8 THEN 'Regular'
                         ELSE 'Budget' END, 'Unknown') AS customer_segment,
           CASE WHEN i % 5 = 0 THEN 'Dhaka'
                WHEN i % 5 = 1 THEN 'Chittagong'
                WHEN i % 5 = 2 THEN 'Sylhet'
                WHEN i % 5 = 3 THEN 'Rajshahi'
                ELSE 'Khulna' END AS city,
           'Bangladesh' AS country,
           DATE '2022-07-08' + CAST(i % 730 AS INTEGER) AS registration_date,
           DATE '2024-07-09' AS effective_date,
           DATE '9999-12-31' AS expiry_date,
           TRUE AS is_current,
           CAST(i + 1 AS INTEGER) AS customer_key
    FROM g
    """,
    covers=("M1", "S8"))
def pipeline_dim_customers_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 customer dimension from the full staging→warehouse build
    (sf_dir unused — the synthetic source is self-contained).  The
    oracle is the initial load's closed form over generate_series —
    generator, staging cleaners, SCD2 literals, and surrogate keys all
    verified row-for-row."""
    return _tables(spark)["dim_customers"]


# Why the two money-bearing pipeline tables stay rows-only: the
# synthetic generator mirrors the reference's float math with
# double→decimal casts (tax = (subtotal−discount)·0.15 cast to
# DECIMAL(10,2)), and that cast's rounding is ENGINE-DEFINED on
# knife-edge doubles — measured: Spark rounds the shortest decimal
# representation half-up (143.92499999999998 → 143.92), DuckDB yields
# 143.93 on the identical double.  No portable SQL expresses "Spark's
# cast", so a value-hash oracle would be chasing cast internals, not
# pipeline correctness; the money columns are instead covered by
# test_pipeline's invariants and by the fixture-table analytics
# queries, whose money math is decimal-exact end-to-end by design.
# (pipeline_dim_customers_scd2 has no money column — hence its full
# closed-form oracle above.)
@query("pipeline_customer_metrics", oracle=None, covers=("A1", "S8"))
def pipeline_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytics.customer_metrics out of the end-to-end pipeline with
    DECIMAL money preserved (the reference's own schema, not the
    fixture mapping)."""
    return _tables(spark)["customer_metrics"]


@query("pipeline_daily_sales", oracle=None, covers=("A1", "S8"))
def pipeline_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytics.daily_sales out of the end-to-end pipeline."""
    return _tables(spark)["daily_sales"]
