"""Contract queries — driver-visible promotions of operators that were
previously proven only in unit tests (VERDICT r01 "pytest-only" rows):

- P6  null-propagating string concat (reference: PG ``||`` in
  warehouse_dag.py:44 — ``first || ' ' || last`` is NULL if either side
  is NULL; ``concat_ws`` would skip NULLs — both semantics exposed).
- Q1/Q7  expected-columns check + the fail-on-error contract
  (staging_dag.py:35-45; tasks fail on exception).
- S2/S3/S4/M3  whole-file CSV scan with declared schema + column
  validation, table-sink overwrite, and full-refresh last-write-wins
  (staging_dag.py:65-76, warehouse_dag.py:296-340).

The roundtrip query does real IO under a per-call temp dir: fixture →
CSV → declared-schema read → overwrite sink (twice — proving refresh
replaces, not appends) → read back; the oracle is simply the source
table, so any corruption in the hop chain hash-mismatches.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import quality as Q
from ..quality import QualityError
from ..schemas import FIXTURES
from ..sources import load, read_csv_declared
from .registry import query


@query(
    "customer_full_name",
    oracle="""
    SELECT c_custkey AS customer_id,
           c_name || ' ' ||
             (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END)
             AS full_name,
           concat_ws(' ', c_name,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END)
             AS full_name_ws
    FROM customer
    """,
    covers=("P6",),
)
def customer_full_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 fidelity pair: ``F.concat`` (NULL-propagating, == PG ``||``,
    warehouse_dag.py:44) vs ``concat_ws`` (NULL-skipping).  The CASE
    injects NULLs (negative-balance rows) so both code paths are
    actually exercised and the oracle distinguishes them."""
    c = load(spark, sf_dir, "customer")
    seg_or_null = (F.when(F.col("c_acctbal") < 0, F.lit(None))
                   .otherwise(F.col("c_mktsegment")))
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.concat(F.col("c_name"), F.lit(" "), seg_or_null).alias("full_name"),
        F.concat_ws(" ", F.col("c_name"), seg_or_null).alias("full_name_ws"),
    )


@query(
    "dq_contract",
    oracle="""
    SELECT * FROM (
      SELECT 'columns:orders' AS check_name,
             CAST(0 AS DOUBLE) AS value, TRUE AS passed
      UNION ALL
      SELECT 'rows:orders',
             CAST((SELECT count(*) FROM orders) AS DOUBLE),
             (SELECT count(*) FROM orders) >= 1
      UNION ALL
      SELECT 'nulls:o_orderdate',
             CAST((SELECT count(*) FROM orders WHERE o_orderdate IS NULL) AS DOUBLE),
             (SELECT count(*) FROM orders WHERE o_orderdate IS NULL) = 0
      UNION ALL
      SELECT 'rule:nonpositive_total',
             CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS DOUBLE),
             (SELECT count(*) FROM orders WHERE o_totalprice <= 0) = 0
      UNION ALL
      SELECT 'contract:fail_on_error_raises', CAST(1 AS DOUBLE), TRUE
    )
    """,
    covers=("Q1", "Q7"),
)
def dq_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 expected-columns + Q7 fail-on-error, surfaced as a check
    report.  The last row PROVES the hard-fail contract: a check that
    must fail (row_count ≥ 1 on an empty frame, soft=False) is executed
    and required to raise ``QualityError`` — the reference's task-
    failure semantics (staging_dag.py:233-259).

    DQ checks are scalar asserts by nature; each value is a one-number
    aggregate (same posture as quality.py — no data-sized collect)."""
    orders = load(spark, sf_dir, "orders")

    col_check = Q.check_columns(
        orders, [f.name for f in FIXTURES["orders"].fields], "orders")
    row_check = Q.check_row_count(orders, 1, "rows:orders")
    null_check = Q.check_null_count(orders, "o_orderdate", at_most=0)
    rule_check = Q.check_rule(orders, F.col("o_totalprice") <= 0,
                              "nonpositive_total", at_most=0)
    try:
        Q.check_row_count(orders.filter(F.lit(False)), 1, "empty_gate")
        raised = False
    except QualityError:
        raised = True

    rows = [
        ("columns:orders", float(col_check.value), bool(col_check.passed)),
        ("rows:orders", float(row_check.value), bool(row_check.passed)),
        ("nulls:o_orderdate", float(null_check.value), bool(null_check.passed)),
        ("rule:nonpositive_total", float(rule_check.value),
         bool(rule_check.passed)),
        ("contract:fail_on_error_raises", 1.0 if raised else 0.0, raised),
    ]
    return spark.createDataFrame(
        rows, "check_name string, value double, passed boolean")


@query(
    "ingest_refresh_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    covers=("S2", "S3", "S4", "M3"),
)
def ingest_refresh_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 whole-file CSV scan with declared schema (PERMISSIVE — the
    pandas errors='coerce' twin), S3 expected-columns validation, S4
    parquet table sink, M3 full refresh: the first overwrite lands a
    partial snapshot, the second overwrites it with the full table —
    the read-back equals the LAST write only (last-write-wins), which
    the oracle (the full source table) verifies."""
    nation = load(spark, sf_dir, "nation")
    work = tempfile.mkdtemp(prefix="ingest_roundtrip_")
    csv_dir, sink = f"{work}/nation_csv", f"{work}/nation_sink"

    nation.coalesce(1).write.mode("overwrite").csv(csv_dir, header=True)
    staged = read_csv_declared(spark, csv_dir, FIXTURES["nation"])   # S2+S3

    staged.filter(F.col("n_regionkey") == 0) \
          .write.mode("overwrite").parquet(sink)                     # stale load
    staged.write.mode("overwrite").parquet(sink)                     # M3 refresh
    return spark.read.parquet(sink).select(
        "n_nationkey", "n_name", "n_regionkey")
