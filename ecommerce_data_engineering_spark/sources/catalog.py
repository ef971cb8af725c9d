"""Session-catalog facade — the engine's BI-serving surface (S6).

The reference exposes 11 views in the `public` schema for Looker
(analytics_dag.py:423-440).  Spark's equivalent is the session
catalog: register the base tables and every analytics query as temp
views, and any SQL client (spark.sql, Thrift server, notebook) can
query them by name.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..schemas import FIXTURE_TABLES
from .readers import load

# the reference's serving views, mapped to registry query names
SERVING_VIEWS = (
    "daily_sales", "monthly_trends", "customer_metrics", "product_metrics",
    "customer_acquisition", "campaign_attribution", "executive_summary",
    "top_products", "customer_segmentation", "seasonal_performance",
    "acquisition_summary",
)


def register_fixtures(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every fixture parquet as a temp view (the staging layer
    of the SQL surface)."""
    for t in FIXTURE_TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(FIXTURE_TABLES)


def register_serving_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the analytics serving layer: one view per reference
    BI view (lazy — views materialize on first query, like any Spark
    temp view; persist to parquet for a caching serving tier)."""
    from ..plans import REGISTRY

    registered = []
    for name in SERVING_VIEWS:
        if name in REGISTRY:
            REGISTRY[name].fn(spark, sf_dir).createOrReplaceTempView(name)
            registered.append(name)
    return registered
