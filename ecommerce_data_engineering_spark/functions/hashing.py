"""Portable (cross-engine deterministic) hashing for dedup / LSH.

MinHash needs a family of hash functions with a consistent total
order.  Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` use
different algorithms, so signatures built from them can never be
oracle-checked.  Instead we hash with **MD5 over a seeded prefix**
(``md5(seed || '\\x1f' || token)``): both engines produce identical
32-char lowercase hex, and the *lexicographic* order of hex strings is
a perfectly good total order for MinHash (the min under any fixed
total order of a uniform hash is a valid MinHash permutation).

Scale note: md5 is a JVM-side codegen'd expression in Spark — no UDF,
no Python round-trip — and the signature is computed in one pass over
the exploded shingle set (map-side), so the approach scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SEED_SEP = ":"  # cannot appear in [a-z0-9 ] word-shingle tokens


def portable_hash_hex(col: Column | str, seed: int | None = None) -> Column:
    """md5 hex digest of (seed-prefixed) string — identical in DuckDB:
    ``md5(CAST(seed AS VARCHAR) || ':' || col)``."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is None:
        return F.md5(c.cast("string"))
    return F.md5(F.concat(F.lit(f"{seed}{SEED_SEP}"), c.cast("string")))


def minhash_cols(token_col: str, num_hashes: int) -> list[Column]:
    """One aggregate column per hash function: min(md5(seed||tok)).

    Used after exploding a document's distinct shingles; groupBy doc
    then ``agg(*minhash_cols('shingle', k))`` yields the k-wide
    signature in a single shuffle.
    """
    return [
        F.min(portable_hash_hex(token_col, seed=i)).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def hex_nibble_value(char_col: Column) -> Column:
    """Value 0..15 of one lowercase hex digit, expressible identically in
    DuckDB as ``strpos('0123456789abcdef', c) - 1`` — used by SimHash."""
    return (F.instr(F.lit("0123456789abcdef"), char_col) - F.lit(1)).cast("int")
