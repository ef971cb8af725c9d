"""Prefix-filtered exact Jaccard (SSJoin/PPJoin family): the whole
contract is *identical results to the exhaustive join with fewer
candidates* — both halves pinned here (the driver additionally
hash-checks the query against the exhaustive SQL oracle)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ecommerce_data_engineering_spark.operators import dedup as D


def _mk_docs(spark, n=120, seed=5):
    """Random word docs with planted near-duplicates and a corpus-hot
    word in every doc (the exhaustive join's quadratic trigger)."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(150)]
    rows = []
    for i in range(n):
        # every doc opens with the same 3-word header → ONE corpus-hot
        # trigram shingle shared by all docs, the exhaustive join's
        # quadratic trigger (a single hot word is not enough: shingles
        # are trigrams, so the hot unit must be 3 consecutive words)
        words = ["the", "quick", "fox"] + rng.sample(vocab,
                                                     rng.randint(6, 20))
        rows.append((i, " ".join(words)))
        if rng.random() < 0.3:          # planted near-dup: drop one word
            rows.append((1000 + i, " ".join(words[:-1])))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_filter_equals_exhaustive(spark):
    docs = _mk_docs(spark)
    sh = D.word_shingles(docs, "text", "doc_id")

    def result(cands):
        return sorted(map(tuple,
                          D.jaccard_verify(cands, sh, "doc_id", 0.3)
                          .collect()))

    sa = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    exhaustive = (sa.join(sb, "shingle")
                  .filter(F.col("id_a") < F.col("id_b"))
                  .select("id_a", "id_b").distinct())
    pruned = D.prefix_filter_candidates(sh, "doc_id", 0.3)

    got, want = result(pruned), result(exhaustive)
    assert got == want and len(want) > 10     # exactness, non-trivially

    # ...with strictly fewer candidates (the point of the filter):
    # every doc shares the 'common' shingle-bearing trigrams, so the
    # exhaustive join is near-quadratic while the prefix join is not
    n_ex, n_pf = exhaustive.count(), pruned.count()
    assert n_pf < n_ex / 2, (n_pf, n_ex)


def test_prefix_filter_thresholds_monotone(spark):
    """Raising the threshold can only shrink the candidate set (longer
    suffix pruned), and candidates always cover the verified pairs."""
    docs = _mk_docs(spark, n=60, seed=9)
    sh = D.word_shingles(docs, "text", "doc_id")
    c_lo = D.prefix_filter_candidates(sh, "doc_id", 0.2)
    c_hi = D.prefix_filter_candidates(sh, "doc_id", 0.8)
    lo = {(r.id_a, r.id_b) for r in c_lo.collect()}
    hi = {(r.id_a, r.id_b) for r in c_hi.collect()}
    assert hi <= lo
    verified = {(r.id_a, r.id_b)
                for r in D.jaccard_verify(c_hi, sh, "doc_id", 0.8).collect()}
    assert verified <= hi
