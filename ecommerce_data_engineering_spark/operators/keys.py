"""Durable surrogate-key assignment (SURVEY.md §2.2 P20).

The reference gets stable keys for free from Postgres SERIAL columns
(database/init.sql:150-170): a customer keeps its customer_key forever.
A recomputed ``row_number()`` does NOT have that property — if a new
natural key sorts before existing ones, every later key shifts and
facts retained from prior runs silently join to the wrong dim rows.

So keys are assigned ONCE, at first sight, and persisted with the dim:

    mapping(run N) = mapping(run N-1)
                   ∪ {new keys → max(prior) + row_number(new keys)}

Scale posture: the incremental path windows only over the RUN'S NEW
keys (bounded by the day's arrivals, not the dim), and the prior max is
a broadcast scalar — no global window after the initial load.  The
initial bulk load is the one place a global-ordered row_number runs;
at 100 TB dim sizes swap that one step for a hash surrogate
(xxhash64 of the natural key) or a per-partition offset assignment —
the incremental contract is unchanged either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def surrogate_mapping(keys: DataFrame, natural_key: str, surrogate: str,
                      prior: DataFrame | None = None) -> DataFrame:
    """Return the durable ``natural_key → surrogate`` mapping.

    ``keys``: frame containing the natural keys present this run (any
    other columns ignored).  ``prior``: last run's mapping (or a dim
    carrying both columns); None = initial load.  Keys never change or
    get reused once assigned; keys absent this run stay in the mapping
    (dims keep history — reference parity with SERIAL).
    """
    distinct = keys.select(natural_key).distinct()
    if prior is None:
        w = Window.orderBy(natural_key)          # initial load only
        return distinct.withColumn(surrogate, F.row_number().over(w))

    prior_map = prior.select(natural_key, surrogate).distinct()
    # null-safe anti join: a NULL natural key (dirty upstream) must be
    # durable like any other — a plain left_anti never matches NULL
    # against NULL, so NULL would be re-classified "new" every run,
    # minting a fresh surrogate each time and growing the mapping
    p = prior_map.select(F.col(natural_key).alias("__pk"))
    new = (distinct.join(
        p, F.col(natural_key).eqNullSafe(F.col("__pk")), "left_anti"))
    prior_max = prior_map.agg(
        F.coalesce(F.max(surrogate), F.lit(0)).alias("__maxk"))
    assigned = (
        new.withColumn("__rn", F.row_number().over(Window.orderBy(natural_key)))
        .crossJoin(F.broadcast(prior_max))
        .select(F.col(natural_key),
                (F.col("__maxk") + F.col("__rn")).alias(surrogate))
    )
    return prior_map.unionByName(assigned)
