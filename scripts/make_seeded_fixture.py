"""Seed-robustness fixture variants (VERDICT r5 #3).

The driver REGENERATES /root/testdata every round under a fresh seed,
so any oracle contract that bakes in a margin or a hash-dependent
layout (the HLL ``within_5pct`` flag, LSH/IVF bucket geometry, simhash
band boundaries, int8 quantization ranges) could pass for five rounds
and then legitimately fail on round six's fixture.  This script
derives an alternate-"seed" variant of an existing fixture by seeded
transformations that preserve SCHEMA, referential integrity, and
row counts while re-randomizing exactly the surfaces those contracts
consume:

- ``events.user_id`` → affine permutation ``(a·id + b) mod N`` over the
  dense id domain ``[0, N)`` (gcd(a, N) = 1 ⇒ bijective).  Distinct
  count and FK validity (user ids ⊂ custkeys) are EXACTLY preserved;
  every HyperLogLog hash input changes.
- ``documents.text`` → injective word map ``w → s<seed>w`` (fixed-length
  prefix ⇒ injective), ``n_chars`` recomputed.  Within-fixture duplicate
  and Jaccard structure is preserved bit-for-bit (same global map on
  every doc); every shingle/minhash/simhash hash input changes.  Same
  construction as make_scaled_fixture.py's cross-copy map, different
  prefix alphabet ('s' vs 'c') so both can compose.
- ``embeddings.embedding`` → signed circular shift: rotate by
  ``(16·seed) mod 64`` dims then negate every dim where
  ``(dim + seed) mod 3 == 0``.  A signed permutation is orthogonal —
  all pairwise dot products and norms are exact-preserved, so true
  top-k/cluster structure is identical — while every LSH hyperplane
  sign, IVF assignment, and quantization range changes.

All other tables copy through byte-identical.  Usage:

    python scripts/make_seeded_fixture.py /tmp/sf_seed1 1
    python scripts/scale_correctness.py /tmp/sf_seed1 --all --tag=seed1

A contract that holds on the driver fixture AND on 3 seeded variants
is evidence the margins survive regeneration, which is what r6's
SEED-sweep records (SCALE_SWEEP_seed*.json) pin.
"""

from __future__ import annotations

import os
import sys

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# multipliers coprime to any plausible dense user-id domain size; the
# seed picks one plus an additive offset so each seed is a distinct
# permutation
_AFFINE_A = {1: 7, 2: 11, 3: 13}


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit("usage: make_seeded_fixture.py OUT_DIR SEED "
                         "[SRC_DIR=/root/testdata/sf0.01]")
    out, seed = sys.argv[1], int(sys.argv[2])
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    if seed not in _AFFINE_A:
        raise SystemExit(f"seed must be one of {sorted(_AFFINE_A)}")

    import duckdb               # plain columnar copy — no Spark needed

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    n_users = con.execute(
        f"SELECT max(user_id) + 1 FROM "
        f"read_parquet('{src}/events.parquet')").fetchone()[0]
    a, b = _AFFINE_A[seed], 3 * seed + 1
    from math import gcd
    while gcd(a, n_users) != 1:   # paranoid: keep the map bijective
        a += 2
    shift = (16 * seed) % 64

    for table in TABLES:
        path = f"{src}/{table}.parquet"
        if table == "events":
            sel = (f"SELECT event_id, ts, "
                   f"CAST((user_id * {a} + {b}) % {n_users} AS BIGINT) "
                   f"AS user_id, event_type, value, props "
                   f"FROM read_parquet('{path}')")
        elif table == "documents":
            word_map = rf"regexp_replace(text, '([a-z0-9]+)', 's{seed}\1', 'g')"
            sel = (f"SELECT doc_id, {word_map} AS text, lang, source, "
                   f"CAST(length({word_map}) AS BIGINT) AS n_chars "
                   f"FROM read_parquet('{path}')")
        elif table == "embeddings":
            rot = (f"(embedding[{shift + 1}:] || embedding[1:{shift}])"
                   if shift else "embedding")
            sel = (f"SELECT vec_id, "
                   f"CAST(list_transform({rot}, (x, i) -> "
                   f"CASE WHEN (i - 1 + {seed}) % 3 = 0 THEN -x ELSE x END) "
                   f"AS FLOAT[]) AS embedding, label "
                   f"FROM read_parquet('{path}')")
        else:
            sel = f"SELECT * FROM read_parquet('{path}')"
        con.execute(f"COPY ({sel}) TO '{out}/{table}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM "
                        f"read_parquet('{out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")
    print(f"seeded variant (seed={seed}, affine {a}·id+{b} mod {n_users}, "
          f"shift {shift}) at {out}")


if __name__ == "__main__":
    main()
