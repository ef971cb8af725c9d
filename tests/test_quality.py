"""DQ-suite unit tests with deliberately broken fixtures
(SURVEY.md §5.2.3 / FIXTURES.md §8): each check must fire."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_data_engineering_spark import quality as Q
from ecommerce_data_engineering_spark.sources.readers import (
    MissingColumnsError, validate_columns)


@pytest.fixture()
def customers(spark):
    return spark.createDataFrame(
        [("C1", "a@x.com", 10.0), ("C2", None, -5.0), ("C3", "c@x.com", 0.0)],
        "customer_id string, email string, price double",
    )


@pytest.fixture()
def orders(spark):
    return spark.createDataFrame(
        [("O1", "C1"), ("O2", "C2"), ("O3", "MISSING"), ("O4", None)],
        "order_id string, customer_id string",
    )


def test_check_columns_fires(customers):
    with pytest.raises(Q.QualityError):
        Q.check_columns(customers, ["customer_id", "nonexistent"])
    assert Q.check_columns(customers, ["customer_id", "email"]).passed


def test_validate_columns_fires(customers):
    with pytest.raises(MissingColumnsError):
        validate_columns(customers, ["customer_id", "ghost_col"], "t")


def test_row_count(customers):
    assert Q.check_row_count(customers, at_least=3).value == 3
    with pytest.raises(Q.QualityError):
        Q.check_row_count(customers, at_least=100)


def test_null_count_fires(customers):
    with pytest.raises(Q.QualityError):
        Q.check_null_count(customers, "email")
    r = Q.check_null_count(customers, "email", at_most=1)
    assert r.value == 1 and r.passed


def test_business_rule_fires(customers):
    with pytest.raises(Q.QualityError):
        Q.check_rule(customers, F.col("price") <= 0, "price_positive")
    assert Q.check_rule(customers, F.col("price") <= 0, "p", at_most=2).value == 2


def test_referential_fires_and_ignores_null_fk(customers, orders):
    with pytest.raises(Q.QualityError):
        Q.check_referential(orders, customers, "customer_id", "customer_id", "o→c")
    r = Q.check_referential(orders, customers, "customer_id", "customer_id",
                            "o→c", soft=True)
    assert r.value == 1          # only O3; NULL FK (O4) is anonymous, not orphan
    assert not r.passed


def test_soft_fail_mirrors_reference(customers):
    """analytics_dag.py:325-328: campaign attribution soft-fails."""
    r = Q.check_null_count(customers, "email", soft=True)
    assert not r.passed          # no raise


def test_aggregate_sanity(customers):
    assert Q.check_aggregate(customers, F.sum("price"), "sum", lo=0.0, hi=100.0).passed
    with pytest.raises(Q.QualityError):
        Q.check_aggregate(customers, F.sum("price"), "sum", lo=1000.0)
