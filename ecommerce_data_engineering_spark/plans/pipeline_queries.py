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


@query("pipeline_dim_customers_scd2", oracle=None, covers=("M1", "S8"))
def pipeline_dim_customers_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 customer dimension from the full staging→warehouse build
    (sf_dir unused — the synthetic source is self-contained)."""
    return _tables(spark)["dim_customers"]


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
