"""Sequence packing: concatenate-and-chunk documents into fixed
token-budget training sequences.

The last curation stage before a training run turns documents into
sequences of exactly ``budget`` tokens.  The standard pretraining
recipe is concat-and-chunk: fix a deterministic document order,
concatenate token streams, and cut every ``budget`` tokens; a document
belongs to the chunk (bin) containing its first token and may spill
into the next.  (Greedy whole-doc bin packing is stateful/recursive
and not window-expressible; concat-and-chunk is what large pretraining
pipelines actually run, wastes zero tokens, and is a pure function of
the order — hence oracle-checkable.)

Spark shape: one cumulative-sum window per packing shard.  A window
over one global order would serialize the corpus through a single
partition, so the shard key is (group, hash-shard of the id): packing
runs embarrassingly parallel across shards, each shard owning its own
bin sequence.  At 100 TB you raise ``num_shards`` with the cluster;
the plan stays a single shuffle (the window's partitioning), and the
only cross-shard cost is one partially-filled trailing bin per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import SEED_SEP, hex_nibble_value, portable_hash_hex


def shard_of(id_col: str, num_shards: int, seed: int = 0):
    """Deterministic shard 0..num_shards-1 from two hex nibbles of the
    portable digest (value 0..255), identical in DuckDB via strpos
    arithmetic — num_shards must divide into 256 meaningfully (≤256)."""
    h = portable_hash_hex(id_col, seed=seed)
    v = (hex_nibble_value(F.substring(h, 1, 1)) * 16
         + hex_nibble_value(F.substring(h, 2, 1)))
    return v % num_shards


def sql_shard_of(id_expr: str, num_shards: int, seed: int = 0) -> str:
    """DuckDB twin of :func:`shard_of`."""
    md5 = f"md5('{seed}{SEED_SEP}' || CAST({id_expr} AS VARCHAR))"
    nib = "(strpos('0123456789abcdef', substring({m}, {i}, 1)) - 1)"
    return (f"(({nib.format(m=md5, i=1)} * 16 + {nib.format(m=md5, i=2)}) "
            f"% {num_shards})")


def pack_sequences(df: DataFrame, id_col: str, size_col: str,
                   budget: int, group_cols: tuple[str, ...] = (),
                   num_shards: int = 16, seed: int = 0) -> DataFrame:
    """Assign every row its packing ``shard`` and starting ``bin_id``.

    ``bin_id = floor(start_offset / budget)`` where ``start_offset``
    is the running token count of all preceding documents in the
    shard's deterministic (by id) order; ``spills`` flags documents
    crossing a chunk boundary.
    """
    w = (Window.partitionBy(*group_cols, "shard")
         .orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    size = F.col(size_col).cast("long")
    start = F.coalesce(F.sum(size_col).over(w).cast("long"), F.lit(0))
    return (df.withColumn("shard", shard_of(id_col, num_shards, seed))
            .withColumn("start_offset", start)
            .withColumn("bin_id",
                        F.floor(F.col("start_offset") / budget).cast("long"))
            .withColumn(
                "spills",
                (F.floor((F.col("start_offset") + size - 1) / budget)
                 > F.col("bin_id")).cast("boolean")))
