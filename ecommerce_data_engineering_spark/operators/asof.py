"""As-of (backward temporal) join — an operator Spark lacks natively.

Semantics: for every left row, attach the latest right row whose time
is ≤ the left row's time, within the same key partition (DuckDB/kdb
"ASOF JOIN", pandas merge_asof direction='backward').

Implementation is the **union + running-last** trick — pure DataFrame
ops, one shuffle, no Python:

    tag right rows 0 and left rows 1, union on (key, ts, tag),
    running last_value(right payload, ignorenulls) ordered by
    (ts, tag) per key, keep tag=1 rows.

Why not ``applyInPandas`` + ``pd.merge_asof``?  That works (and is the
fallback for exotic variants like nearest/tolerance) but forces every
row through Arrow+Python; the union form stays in Tungsten and scales
as an ordinary window — partitioned by the join key, so no global
sort, and skew only where one key truly dominates.  The (ts, tag)
ordering makes the match inclusive (right row at exactly left.ts
matches — ``>=`` semantics) and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              value_cols: list[str] | None = None,
              suffix: str = "_right") -> DataFrame:
    """Backward as-of join of ``right`` onto ``left`` (left-outer: left
    rows with no earlier right row keep NULLs).

    on: ordering (time) column present in both; by: equi-key column;
    value_cols: right columns to attach (default: all except key/time).
    Right's own ``on`` value is attached as ``{on}{suffix}``.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    ltypes = dict(left.dtypes)
    out_names = [(c, f"{c}{suffix}" if c in left.columns else c)
                 for c in value_cols]

    # The attached columns travel as ONE struct so the matched right row
    # is atomic: running-last over the struct attaches the latest row
    # AS-IS — a NULL field in that row stays NULL instead of being
    # back-filled from an older row (pandas merge_asof / DuckDB ASOF
    # semantics; per-column last(ignorenulls) would mix rows).
    payload_expr = F.struct(
        *[F.col(c).alias(a) for c, a in out_names],
        F.col(on).alias(f"{on}{suffix}"),
    )
    payload_type = right.select(payload_expr.alias("p")).schema["p"].dataType

    l_side = (left.withColumn("__tag", F.lit(1))
              .withColumn("__payload", F.lit(None).cast(payload_type)))
    # ASOF semantics for NULLs (pandas merge_asof / DuckDB ASOF): a
    # right row with a NULL time can never satisfy ts <= left.ts, and a
    # NULL equi-key matches nothing.  Without this filter Spark's
    # NULLS-FIRST ordering would attach NULL-time rows as the
    # "earliest" payload, and Window.partitionBy would group NULL keys
    # together into phantom matches.  (NULL-key/NULL-time LEFT rows
    # keep NULL payloads naturally once these right rows are gone.)
    r_side = (right.filter(F.col(on).isNotNull() & F.col(by).isNotNull())
              .select(by, on, payload_expr.alias("__payload"))
              .withColumn("__tag", F.lit(0)))
    for c in left.columns:
        if c not in (by, on):
            r_side = r_side.withColumn(c, F.lit(None).cast(ltypes[c]))

    w = (Window.partitionBy(by).orderBy(F.col(on), F.col("__tag"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l_side.unionByName(r_side)
               .withColumn("__payload",
                           F.last("__payload", ignorenulls=True).over(w))
               .filter(F.col("__tag") == 1))
    return matched.select(
        *left.columns,
        *[F.col(f"__payload.{a}").alias(a) for _, a in out_names],
        F.col(f"__payload.{on}{suffix}").alias(f"{on}{suffix}"),
    )
