"""Skew-stress fixture variant (round 6).

The scaled fixtures (make_scaled_fixture.py) union key-SHIFTED copies,
so every key stays as uniform as the driver's generator made it — they
probe volume, not skew.  This script derives a deliberately PATHOLOGICAL
variant of an existing fixture: hot keys owning a large fraction of a
fact table, a NULL-key mass (the reference's ~30%-anonymous clickstream,
professional_readme.md §data model), giant exact-duplicate document
clusters, and identical-embedding LSH buckets.  Schema, row counts, and
referential integrity are preserved; only the key/payload DISTRIBUTION
changes, deterministically (hash-selected rows, no RNG), so the full
Spark-vs-DuckDB oracle diff still applies — both engines see the same
pathological data and must agree row-for-row.

What this catches that volume sweeps cannot:

- a salted/NULL-bypass join (operators/skew.py) whose mitigation CHANGES
  results (lost rows on the bypass union, per-salt right-row duplication);
- a dedup cap or Σ|bucket|² bound that silently TRUNCATES pairs when one
  bucket holds a large clique (dedup_minhash_lsh's banding, simhash
  chunks, exact-dup groups);
- group-by aggregates whose wide-sum path only engages on a giant group
  (one customer owning 30% of orders, one part on 30% of lineitems);
- ANN/IVF cells and LSH buckets holding a constant fraction of the corpus.

Injected skew (all selections via ``hash(id) % 100`` — deterministic,
seed-free):

- ``events``: 35% of rows get ``user_id = <min custkey>`` (hot user),
  a further 25% get ``user_id = NULL`` (anonymous traffic);
- ``orders``: 30% of rows get ``o_custkey = <min custkey>``;
- ``lineitem``: 30% of rows get ``l_partkey = <min partkey>`` (order/
  supplier FKs untouched);
- ``documents``: 5% of docs share one literal text (one giant exact-dup
  clique ⇒ one giant shingle/minhash/simhash bucket), n_chars recomputed;
- ``embeddings``: 5% of vectors become one identical unit-ish vector
  (one giant cosine clique / LSH bucket / IVF cell).

Usage:

    python scripts/make_skewed_fixture.py /tmp/sf_skew
    python scripts/scale_correctness.py /tmp/sf_skew --all --tag=skew
"""

from __future__ import annotations

import os
import sys

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

HOT_TEXT = ("the hot duplicate document body that every clique member "
            "shares word for word across the skew stress corpus")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_skew"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb               # plain columnar copy — no Spark needed

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    hot_cust = con.execute(
        f"SELECT min(c_custkey) FROM "
        f"read_parquet('{src}/customer.parquet')").fetchone()[0]
    hot_part = con.execute(
        f"SELECT min(p_partkey) FROM "
        f"read_parquet('{src}/part.parquet')").fetchone()[0]
    dim = con.execute(
        f"SELECT len(embedding) FROM "
        f"read_parquet('{src}/embeddings.parquet') LIMIT 1").fetchone()[0]
    # any fixed non-degenerate vector works; alternate signs so no
    # hyperplane is trivially orthogonal to it
    hot_vec = ("[" + ", ".join(
        f"CAST({0.25 if i % 2 == 0 else -0.25} AS FLOAT)"
        for i in range(dim)) + "]")

    for table in TABLES:
        path = f"{src}/{table}.parquet"
        if table == "events":
            sel = (f"SELECT event_id, ts, "
                   f"CASE WHEN hash(event_id) % 100 < 35 "
                   f"       THEN CAST({hot_cust} AS BIGINT) "
                   f"     WHEN hash(event_id) % 100 < 60 "
                   f"       THEN CAST(NULL AS BIGINT) "
                   f"     ELSE user_id END AS user_id, "
                   f"event_type, value, props "
                   f"FROM read_parquet('{path}')")
        elif table == "orders":
            sel = (f"SELECT * REPLACE(CASE WHEN hash(o_orderkey) % 100 < 30 "
                   f"THEN CAST({hot_cust} AS BIGINT) ELSE o_custkey END "
                   f"AS o_custkey) FROM read_parquet('{path}')")
        elif table == "lineitem":
            sel = (f"SELECT * REPLACE(CASE WHEN "
                   f"hash(l_orderkey * 10 + l_linenumber) % 100 < 30 "
                   f"THEN CAST({hot_part} AS BIGINT) ELSE l_partkey END "
                   f"AS l_partkey) FROM read_parquet('{path}')")
        elif table == "documents":
            sel = (f"SELECT doc_id, "
                   f"CASE WHEN hash(doc_id) % 100 < 5 THEN '{HOT_TEXT}' "
                   f"ELSE text END AS text, lang, source, "
                   f"CAST(length(CASE WHEN hash(doc_id) % 100 < 5 "
                   f"THEN '{HOT_TEXT}' ELSE text END) AS BIGINT) AS n_chars "
                   f"FROM read_parquet('{path}')")
        elif table == "embeddings":
            sel = (f"SELECT vec_id, "
                   f"CASE WHEN hash(vec_id) % 100 < 5 "
                   f"THEN CAST({hot_vec} AS FLOAT[]) "
                   f"ELSE embedding END AS embedding, label "
                   f"FROM read_parquet('{path}')")
        else:
            sel = f"SELECT * FROM read_parquet('{path}')"
        con.execute(f"COPY ({sel}) TO '{out}/{table}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM "
                        f"read_parquet('{out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")
    print(f"skew-stress variant (hot_cust={hot_cust}, hot_part={hot_part}) "
          f"at {out}")


if __name__ == "__main__":
    main()
