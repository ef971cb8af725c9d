"""Keyed upsert + insert-if-absent rewrites (SURVEY.md §2.8 M2/M4).

Reference semantics:
  M2  DELETE rows whose key is in this batch, re-INSERT from staging
      (warehouse_dag.py:202-227 orders, 247-273 order items) —
      idempotent daily re-load.
  M4  ``ON CONFLICT (time_key) DO NOTHING`` + NOT IN guard
      (warehouse_dag.py:179-180) — insert only absent keys.

Both become anti-join + union on immutable storage.  Scale: a single
shuffle on the key; with monthly-partitioned facts the rewrite touches
only the partitions present in the batch (partition-pruned overwrite /
``replaceWhere`` under Delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def keyed_upsert(old: DataFrame, batch: DataFrame, keys: list[str] | str) -> DataFrame:
    """M2: old rows not in batch keys + all batch rows.

    Schemas must align by name.  The common trap: a fact persisted via
    ``write_partitioned`` reads back with its derived partition column
    (e.g. ``order_month``) as a real column, which the freshly built
    batch lacks — drop it before upserting.  The check below turns the
    opaque union AnalysisException into the actionable error."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    extra = set(old.columns) - set(batch.columns)
    if extra:
        raise ValueError(
            f"keyed_upsert: old carries columns absent from batch "
            f"{sorted(extra)} — if these are read-back partition "
            f"columns (write_partitioned derives them), .drop() them "
            f"before the upsert")
    survivors = old.join(batch.select(*keys).distinct(), keys, "left_anti")
    return survivors.unionByName(batch)


def insert_if_absent(existing: DataFrame, incoming: DataFrame,
                     keys: list[str] | str) -> DataFrame:
    """M4: existing + incoming rows whose key is absent (first-writer-wins)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    fresh = incoming.join(existing.select(*keys).distinct(), keys, "left_anti")
    return existing.unionByName(fresh)
