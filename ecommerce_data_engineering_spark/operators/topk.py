"""Top-k operators (SURVEY.md §2.6 W1, §2.7 O1).

The reference ranks products with a *global* ``RANK() OVER (ORDER BY
revenue DESC)`` then LIMIT 20 (analytics_dag.py:365-370).  A global
window forces every row through one partition — fine for 650 products,
wrong at 100 TB.  ``distributed_topk`` instead uses
``orderBy(...).limit(k)``, which Spark executes as
TakeOrderedAndProject: each partition keeps its local top-k, the driver
merges k·P candidates — no global shuffle, no single hot partition.
The rank column is then computed over the ≤k surviving rows (trivial).

Determinism: callers must pass a total order (include a unique
tiebreaker column) so the same k rows are selected on every engine —
required for the DuckDB oracle hash-compare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def distributed_topk(df: DataFrame, order: list[Column], k: int,
                     rank_on: Column | None = None,
                     rank_name: str = "rank") -> DataFrame:
    """Global top-k without a global window; optional rank column."""
    top = df.orderBy(*order).limit(k)
    if rank_on is not None:
        top = top.withColumn(rank_name, F.rank().over(Window.orderBy(rank_on)))
    return top


def topk_per_group(df: DataFrame, group_cols: list[str], order: list[Column],
                   k: int, rank_name: str = "rn") -> DataFrame:
    """Top-k within each group — partitioned window, scales with groups."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn(rank_name, F.row_number().over(w))
              .filter(F.col(rank_name) <= k))
