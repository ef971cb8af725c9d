"""Synthesize a larger, referentially-consistent fixture by unioning
key-shifted copies of an existing one — scale-correctness evidence
beyond the largest driver-generated fixture.

Every surrogate/foreign key in copy k is shifted by k·OFFSET, so joins
resolve within a copy exactly as in the original (region/nation are
genuine shared dims and stay single-copy: nationkeys are stable).  The
point is NOT realism — it is running the FULL Spark-vs-DuckDB
oracle-diff suite on data several times larger than sf0.1 to prove no
query has scale-dependent tie/cap/overflow divergence:

    python scripts/make_scaled_fixture.py /tmp/sf_synth 4
    SPARK_GRAFT_TEST_SF_DIR=/tmp/sf_synth \
        python -m pytest tests/test_oracle_diff.py -q

Text/embedding payloads are PERTURBED per copy (r4, VERDICT r3 #5):
r3's exact clones gave every doc 4 exact copies, which inflated the
pair-emitting dedup operators' all-pairs volume ~16x past any real
corpus and forced their exclusion from the sweep.  Copy k>0 now maps
every word w -> 'c{k:02d}w' (fixed-width prefix, injective per word
AND across copies, so shingle sets map injectively: WITHIN-copy
Jaccard/SimHash structure is preserved bit-for-bit while CROSS-copy
shingle overlap is zero) and circularly shifts embeddings by
(7*k) % 64 of 64 dims (a permutation is orthogonal: within-copy dot
products and norms exact, cross-copy cosine decorrelated; the stride
is coprime to 64 so no copy or copy pair is shift-aligned up to 64
copies — r6 needs 16 for the overflow/skew-regime sweep).  Duplicate density therefore scales linearly (4x), not
quadratically, and all pair-emitting queries stay oracle-diffable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 10_000_000          # beyond any fixture key at any driver sf

# table -> columns shifted by k*OFFSET in copy k (FK-consistent)
KEYS = {
    "region": [],            # shared dims: single copy, stable keys
    "nation": [],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_synth"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    # The embedding shift stride is COPRIME to the 64-dim cycle
    # (gcd(7, 64) = 1), so shifts (7·k) % 64 are pairwise distinct for
    # k < 64 and never the identity for 0 < k < 64 — no copy carries
    # exact-duplicate embeddings and no copy PAIR is shift-aligned
    # (the k=4 wrap that capped the r5 version at 4 copies is gone).
    # The word map 'c{k:02d}w' is fixed-width, so prefixes are
    # injective ACROSS copies too ('c1'+'2foo' vs 'c12'+'foo' was the
    # double-digit collision); it assumes the source vocabulary never
    # starts with 'c<digit><digit>' (true for the driver's generator).
    if copies > 64:
        raise SystemExit(
            f"copies={copies} > 64: embedding circular shift (7*k)%64 "
            f"wraps to identity at k=64, reintroducing exact-duplicate "
            f"embeddings. Use copies<=64 or add a non-wrapping "
            f"per-copy permutation first.")

    import duckdb               # plain columnar copy — no Spark needed

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        path = f"{src}/{table}.parquet"
        base_rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        # Representative row-group layout (r4 lesson, extended to the
        # scaled fixtures in r6): DuckDB's default 122,880-row groups
        # left text-light tables (documents: 320k rows at 64x) with <=3
        # groups, capping Spark's DECODE parallelism at 3 cores and
        # polluting throughput multiples with a layout artifact no real
        # lake has.  Target ~64 groups per table, capped at the DuckDB
        # default so already-fine tables (lineitem: 312 groups) keep it.
        # size groups from the rows THIS branch actually writes: keyless
        # tables (region/nation) are copied once regardless of `copies`,
        # so using base_rows*copies for them overshot the ~64-group
        # target by the copy factor (ADVICE r6 — harmless only because
        # those dims are tiny)
        out_rows = base_rows if not keys else base_rows * max(copies, 1)
        rgs = min(122_880, max(4_096, out_rows // 64))
        if not keys:
            con.execute(f"COPY (SELECT * FROM read_parquet('{path}')) TO "
                        f"'{out}/{table}.parquet' "
                        f"(FORMAT PARQUET, ROW_GROUP_SIZE {rgs})")
            continue
        sels = []
        for k in range(copies):
            exprs = []
            for c in [r[0] for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{path}')"
                    ).fetchall()]:
                if c in keys:
                    exprs.append(f"({c} + {k * OFFSET}) AS {c}")
                elif k > 0 and table == "documents" and c == "text":
                    # injective word map: within-copy dup structure
                    # exact, cross-copy shingle overlap zero
                    exprs.append(
                        rf"regexp_replace(text, '([a-z0-9]+)', "
                        rf"'c{k:02d}\1', 'g') AS text")
                elif k > 0 and table == "documents" and c == "n_chars":
                    exprs.append(
                        rf"CAST(length(regexp_replace(text, "
                        rf"'([a-z0-9]+)', 'c{k:02d}\1', 'g')) AS BIGINT) "
                        rf"AS n_chars")
                elif k > 0 and table == "embeddings" and c == "embedding":
                    s = (7 * k) % 64    # orthogonal circular shift
                    exprs.append(
                        f"(embedding[{s + 1}:] || embedding[1:{s}]) "
                        f"AS embedding")
                else:
                    exprs.append(c)
            sels.append(f"SELECT {', '.join(exprs)} "
                        f"FROM read_parquet('{path}')")
        con.execute(f"COPY ({' UNION ALL '.join(sels)}) TO "
                    f"'{out}/{table}.parquet' "
                    f"(FORMAT PARQUET, ROW_GROUP_SIZE {rgs})")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({copies} copies)")


if __name__ == "__main__":
    main()
