"""Pins the bounded (engine-side digest) compare — VERDICT r7 #4.

The digest path must be verdict-compatible with the full pandas
compare: equal multisets digest equal ACROSS ENGINES (the hard part:
float formatting, ties, nulls, NaN, timestamps), and any difference a
driver hash would catch must flip the digest.  Hostile values are
pinned here because they are exactly the ones that diverged during
construction: odd/1024 dyadic ties (printf half-up vs half-even),
|x| ≥ 1e15 (Java shortest-repr zero-padding vs C exact expansion).
"""

from __future__ import annotations

import pytest

from .oracle import (DigestUnsupported, compare, digest_compare,
                     duckdb_run)

SF = "/root/testdata/sf0.001"

# (value literal SQL, python) rows: id, s(string), f(double), d(date),
# t(timestamp), b(bool) — including NULLs, NaN, dyadic ties, negatives
ROWS = [
    # f is CAST AS DOUBLE so DuckDB types the whole union DOUBLE even
    # when later rows are dropped (bare 1.23 would type DECIMAL)
    "SELECT 1 AS id, 'plain' AS s, CAST(1.23 AS DOUBLE) AS f, "
    "DATE '2024-01-02' AS d, "
    "TIMESTAMP '2024-01-02 03:04:05.123456' AS t, TRUE AS b",
    "SELECT 2, NULL, 0.0009765625, NULL, NULL, FALSE",          # odd/1024 tie
    "SELECT 3, '', -0.0029296875, DATE '1999-12-31', "
    "TIMESTAMP '1999-12-31 23:59:59', NULL",                    # negative tie
    "SELECT 4, 'x\ny', NULL, DATE '2024-02-29', "
    "TIMESTAMP '2024-02-29 00:00:00', TRUE",
    "SELECT 5, 'unicode ∅µ', 123456789.123456789, DATE '2024-01-02', "
    "TIMESTAMP '2024-01-02 03:04:05', FALSE",
    "SELECT 6, 'nan-row', CAST('nan' AS DOUBLE), NULL, NULL, TRUE",
    # magnitude bands: a 3e10-class money sum (the live 4x-fixture
    # divergence: x*1e9 > 2^53 where Java/C printf disagree), values
    # hugging the A/B, B/C and C/D band edges, and negative mid-band
    "SELECT 7, 'bandC', CAST(30224470000.1234 AS DOUBLE), NULL, NULL, TRUE",
    "SELECT 8, 'bandA-edge', CAST(8999999.9999 AS DOUBLE), NULL, NULL, TRUE",
    "SELECT 9, 'bandB-edge', CAST(9000000.0001 AS DOUBLE), NULL, NULL, FALSE",
    "SELECT 10, 'bandD', CAST(9.1e12 AS DOUBLE), NULL, NULL, TRUE",
    "SELECT 11, 'bandC-neg', CAST(-30224470000.1234 AS DOUBLE), NULL, NULL, FALSE",
    # the ADVICE r8 band: 9e6–9e9 at 1e-6 granularity (a 1e7-magnitude
    # money sum used to be quantized at 1e-3, hiding sub-5e-4 drift)
    "SELECT 12, 'bandB-mid', CAST(30724470.123456 AS DOUBLE), NULL, NULL, TRUE",
    "SELECT 13, 'bandB/C-edge', CAST(9000000000.0001 AS DOUBLE), NULL, NULL, FALSE",
]
ORACLE = " UNION ALL ".join(ROWS)


def _spark_literal_df(spark, rows_sql: str):
    # identical literal SQL evaluates on the Spark side (Spark accepts
    # the same literal forms); NaN literal differs: Spark needs
    # CAST('NaN' AS DOUBLE), which duck also accepts — shared above.
    return spark.sql(rows_sql.replace("CAST('nan' AS DOUBLE)",
                                      "CAST('NaN' AS DOUBLE)"))


@pytest.fixture(scope="module", autouse=True)
def _utc(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_digest_parity_on_hostile_literals(spark):
    sdf = _spark_literal_df(spark, ORACLE)
    assert digest_compare(sdf, ORACLE, SF, "hostile") == []


def test_digest_detects_float_perturbation(spark):
    # 2e-9 is above the shared 1e-9 fixed-point granularity
    bad = ORACLE.replace("1.23", "1.230000002")
    sdf = _spark_literal_df(spark, ORACLE)
    errs = digest_compare(sdf, bad, SF, "perturbed")
    assert errs and "digest differs" in errs[0]


def test_digest_detects_dropped_and_swapped_rows(spark):
    sdf = _spark_literal_df(spark, ORACLE)
    dropped = " UNION ALL ".join(ROWS[:-1])
    errs = digest_compare(sdf, dropped, SF, "dropped")
    assert errs and "row count" in errs[0]
    swapped = ORACLE.replace("'plain'", "'plaim'")
    errs = digest_compare(sdf, swapped, SF, "swapped")
    assert errs and "digest differs" in errs[0]


def test_digest_detects_midband_micro_drift(spark):
    # ADVICE r8: a 5e-4 drift in a 1e7-magnitude column was invisible
    # under the old 1e-3 band; the 1e-6 band must catch it
    bad = ORACLE.replace("30724470.123456", "30724470.123956")
    sdf = _spark_literal_df(spark, ORACLE)
    errs = digest_compare(sdf, bad, SF, "midband-drift")
    assert errs and "digest differs" in errs[0]


def test_digest_detects_null_vs_value(spark):
    nulled = ORACLE.replace("123456789.123456789", "NULL")
    sdf = _spark_literal_df(spark, ORACLE)
    errs = digest_compare(sdf, nulled, SF, "nulled")
    assert errs and "digest differs" in errs[0]


def test_digest_is_order_insensitive(spark):
    # keep ROWS[0] first (it carries the column aliases), reverse the
    # rest — same multiset, different order
    reordered = " UNION ALL ".join([ROWS[0]] + list(reversed(ROWS[1:])))
    sdf = _spark_literal_df(spark, ORACLE)
    assert digest_compare(sdf, reordered, SF, "reordered") == []


def test_digest_refuses_big_floats(spark):
    big = ORACLE.replace("CAST(1.23 AS DOUBLE)", "CAST(1.5e22 AS DOUBLE)")
    sdf = _spark_literal_df(spark, big)
    with pytest.raises(DigestUnsupported, match="printf parity"):
        digest_compare(sdf, big, SF, "big")


def test_digest_refuses_arrays(spark):
    sql = "SELECT vec_id, embedding FROM embeddings"
    from ecommerce_data_engineering_spark.sources import load

    sdf = load(spark, SF, "embeddings").select("vec_id", "embedding")
    with pytest.raises(DigestUnsupported):
        digest_compare(sdf, sql, SF, "arrays")


def test_digest_flags_dtype_drift(spark):
    # oracle emits DOUBLE where Spark emits BIGINT: values equal,
    # families differ — the driver hashes raw cells, so this must fail
    sdf = spark.sql("SELECT 1 AS id, 7 AS v")
    errs = digest_compare(sdf, "SELECT 1 AS id, 7.0 AS v",
                          SF, "drift")
    assert errs and any("dtype drift" in e for e in errs)


@pytest.mark.parametrize("qname", [
    "customer_metrics",        # strings/ints/doubles/dates
    "monthly_trends",          # global sort, month keys
    "pricing_summary",         # decimal-exact money sums as double
    "coerce_event_props",      # the r7 sweep's slowest row-emitter
    "embedding_ann_production",  # float cosine + ranks
])
def test_digest_agrees_with_full_compare_on_registry(spark, qname):
    from ecommerce_data_engineering_spark.plans import REGISTRY

    spec = REGISTRY[qname]
    sdf = spec.fn(spark, SF)
    full = compare(sdf, duckdb_run(spec.oracle, SF), qname)
    bounded = digest_compare(spec.fn(spark, SF), spec.oracle, SF, qname)
    assert full == [] and bounded == [], (full, bounded)
