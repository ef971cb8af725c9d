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


MINHASH_P = (1 << 31) - 1   # Mersenne prime: universal-hash modulus


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) multiplier/offset table for the
    universal-hash family h_i(x) = (a_i·x + b_i) mod P.  Derived from
    fixed golden-ratio / Weyl constants so the Spark expressions and
    the DuckDB oracle SQL enumerate the identical table."""
    return [((2654435761 * (i + 1)) % MINHASH_P or 1,
             (40503 * (i + 7)) % MINHASH_P)
            for i in range(num_hashes)]


def minhash_base(token_col: Column | str) -> Column:
    """28-bit integer digest of a token: first 7 hex chars of ONE md5.
    DuckDB twin: ``CAST(('0x' || substring(md5(tok), 1, 7)) AS
    BIGINT)`` — bit-identical."""
    c = F.col(token_col) if isinstance(token_col, str) else token_col
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def minhash_cols(token_col: str, num_hashes: int) -> list[Column]:
    """One aggregate column per hash function:
    min((a_i·md5_28(tok) + b_i) mod P).

    Used after exploding a document's distinct shingles; groupBy doc
    then ``agg(*minhash_cols('shingle', k))`` yields the k-wide
    signature in a single shuffle.

    One md5 per token + k codegen'd multiply-add-mods, instead of the
    k salted md5s of the naive form — 8x fewer digest computations on
    the exploded shingle frame, the hot path of MinHash at corpus
    scale (measured: signatures stage 1.7 s → ~0.4 s at sf0.1).
    a_i·x < 2^59 so the arithmetic never overflows int64 in either
    engine.

    Each column is ONE ``F.expr`` parse: the Column-API form cost
    ~10 py4j round-trips per hash at plan construction (×k hashes,
    r11); the parsed tree is canonically identical —
    sameSemantics-pinned in tests/test_expr_parity.py."""
    base = (f"CAST(conv(substring(md5(`{token_col}`), 1, 7), 16, 10) "
            f"AS BIGINT)")
    return [
        F.expr(f"min(({base} * {a} + {b}) % {MINHASH_P})").alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    ]


def hex_nibble_value(char_col: Column) -> Column:
    """Value 0..15 of one lowercase hex digit, expressible identically in
    DuckDB as ``strpos('0123456789abcdef', c) - 1`` — used by SimHash."""
    return (F.instr(F.lit("0123456789abcdef"), char_col) - F.lit(1)).cast("int")
