"""Generate a CLUSTERED-embedding fixture (mixture of Gaussians) →
/tmp/sf_clustered* (VERDICT r9 #4).

Why: every recall number in RECALL.json before r10 was measured on the
driver's near-uniform synthetic vectors — the adversarial no-structure
case where the production IVF point must legitimately spend ~44% of
the corpus per query to hit the 0.8 recall floor.  Real-world
embeddings are CLUSTERED (that is the entire premise of IVF): a
query's true neighbors are semantically close, so they co-locate in
one (or few) coarse cells and the needed probe fraction collapses.
This generator makes that measurable instead of claimed
(plans/extensions.py docstring): mixture-of-Gaussians vectors with
cluster separation chosen so within-cluster cosine ≈ 0.9 and
cross-cluster cosine ≈ 0 — generic, public textbook structure, not
tuned to the engine.

Layout matches the driver fixture contract exactly
(`vec_id` int64, `embedding` list<float32> of 64 dims, `label` int32 =
the generating mixture component; queries are vec_id < 50):

- semantic cluster of vector i = i % n_clusters (clusters interleave
  across the id space, so the 50 query vectors land in 50 DIFFERENT
  clusters and the deterministic seed grid samples across clusters);
- cluster size = 20 (so every query's exact top-5 neighbors exist
  inside its own cluster at every fixture scale);
- deterministic: numpy PCG64 seeded from (n, dim) only.

    python scripts/make_clustered_fixture.py /tmp/sf_clustered 2000 \
        --docs-from /root/testdata/sf0.1

--docs-from copies documents.parquet alongside (the full ann_recall.py
run needs it for the MinHash pair-recall section); the 16x/64x
clustered dirs used only by the k_cells scaling sweep skip it.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
CLUSTER_SIZE = 20
NOISE_SIGMA = 0.35      # within-cluster cos ≈ 1/(1+σ²) ≈ 0.89


def make(out: str, n: int, docs_from: str | None) -> None:
    n_clusters = max(1, n // CLUSTER_SIZE)
    # integer-only seed: str hash() is randomized per process
    rng = np.random.default_rng(1_000_003 * n + DIM)
    centers = rng.standard_normal((n_clusters, DIM))
    labels = (np.arange(n) % n_clusters).astype(np.int32)
    vecs = (centers[labels]
            + NOISE_SIGMA * rng.standard_normal((n, DIM))).astype(np.float32)
    os.makedirs(out, exist_ok=True)
    table = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels),
    })
    # several row groups so Spark parallelizes the scan (the r9
    # single-row-group straggler lesson applies to generated fixtures)
    pq.write_table(table, os.path.join(out, "embeddings.parquet"),
                   row_group_size=max(2048, n // 16))
    print(f"wrote {out}/embeddings.parquet: {n} vectors, "
          f"{n_clusters} clusters of ~{CLUSTER_SIZE}")
    if docs_from:
        src = os.path.join(docs_from, "documents.parquet")
        shutil.copy(src, os.path.join(out, "documents.parquet"))
        print(f"copied documents.parquet from {docs_from}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    docs_from = None
    for a in sys.argv[1:]:
        if a.startswith("--docs-from="):
            docs_from = a.split("=", 1)[1]
        elif a.startswith("--docs-from"):
            sys.exit("use --docs-from=DIR")
        elif a.startswith("-"):
            sys.exit(f"unknown flag {a!r}")
    if len(args) != 2:
        sys.exit("usage: make_clustered_fixture.py OUTDIR N "
                 "[--docs-from=DIR]")
    make(args[0], int(args[1]), docs_from)


if __name__ == "__main__":
    main()
