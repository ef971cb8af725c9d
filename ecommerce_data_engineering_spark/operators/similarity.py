"""Similarity search over embedding columns (array<float>).

Two strategies:

- ``cosine_topk`` — exact brute-force top-k: query set × corpus with
  JVM-side ``zip_with``/``aggregate`` dot products (no Python UDF, no
  Arrow round-trip).  Cost O(|Q|·|C|·d): the correctness baseline, and
  the right answer when |Q| is small and the corpus side broadcasts.

- ``lsh_cosine_topk`` — random-hyperplane LSH: sign-bucket every vector
  with H shared pseudo-random hyperplanes (derived deterministically
  from md5, so the oracle can reproduce them), candidate = same bucket,
  exact cosine within bucket.  Cost Σ_bucket |Q_b|·|C_b|·d — the 100 TB
  scale path (bucket count grows 2^H; multi-probe/tables are the
  production refinement, IVF the alternative — see operators/ivf
  docstring note below).

All arithmetic is double (floats are upcast first) and rounded before
ranking so results are deterministic and reproducible cross-engine.
"""

from __future__ import annotations

from ..functions.rounding import pround, pround_sql
from pyspark.sql import DataFrame, Window, functions as F


def _dot_sql(a: str, b: str) -> str:
    """SQL text of the double-cast left-to-right dot product (see
    :func:`_dot`) — callers fold it into larger single-parse exprs."""
    return (f"aggregate(zip_with(CAST(`{a}` AS ARRAY<DOUBLE>), "
            f"CAST(`{b}` AS ARRAY<DOUBLE>), (x, y) -> x * y), "
            f"0.0D, (acc, x) -> acc + x)")


def _cosine_sql(a: str, b: str, na: str, nb: str) -> str:
    """pround(dot/(na·nb), 6) as ONE SQL text — the ranking cosine every
    top-k variant computes, spelled once so the four call sites cannot
    drift and plan construction pays one parse instead of ~30 py4j
    round-trips (r11; equivalence pinned in tests/test_expr_parity.py)."""
    return (f"floor((({_dot_sql(a, b)}) / (`{na}` * `{nb}`)) "
            f"* 1000000 + 0.5D) / 1000000")


def _dot(a: str, b: str):
    # Cast each ARRAY to double once per row (a codegen'd Cast, exact
    # for float32 inputs) instead of casting inside the lambda: HOF
    # lambdas are interpreted per ELEMENT, so the two per-element Cast
    # nodes were ~40% of the dominant candidate-scoring cost (measured
    # r11, 64x: 3M pairs x 64 dims).  Summation stays left-to-right —
    # bit-identical values.  ONE F.expr parse, not Column-API lambdas:
    # each Python-lambda HOF costs dozens of py4j round-trips at plan
    # CONSTRUCTION (the _plane_sign_bit_sql lesson); the parsed tree is
    # canonically identical (sameSemantics-pinned in tests).
    return F.expr(_dot_sql(a, b))


def with_norm(df: DataFrame, vec_col: str = "embedding",
              out_col: str = "norm") -> DataFrame:
    """L2 norm per vector, DROPPING zero-norm rows — the cosine
    front-door, not a pure projection (row counts shrink).

    Zero-norm vectors (all-zero or empty arrays) are dropped: cosine
    against them is 0/0, which Spark evaluates to NULL while DuckDB
    yields NaN — and NaN compares GREATER than everything in DuckDB's
    ORDER BY/`>=`, so the two engines would rank/filter such pairs
    differently.  Excluding them up front (mirrored by the oracles'
    ``HAVING sum(x*x) > 0``) makes every downstream cosine defined and
    cross-engine exact.  Fixture corpora contain none, so results are
    unchanged there; the semantics are pinned by
    test_zero_norm_vectors_excluded_from_similarity."""
    # One interpreted pass (acc + x*x over the row-level double cast)
    # instead of transform-then-aggregate: same elements, same
    # left-to-right order, no intermediate squared array — bit-identical
    # and ~2x fewer interpreted node evals (r11, guide §1.2 step 2).
    # One F.expr parse (not Column-API lambdas) for the same
    # construction-cost reason as _dot; tree sameSemantics-identical.
    sq = F.expr(
        f"aggregate(CAST(`{vec_col}` AS ARRAY<DOUBLE>), "
        f"0.0D, (acc, x) -> acc + x * x)")
    return df.withColumn(out_col, F.sqrt(sq)).filter(F.col(out_col) > 0)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rn).  Ranking is on
    floor((cos) * 1000000000 + 0.5) / 1000000000 with neighbor-id tiebreak → engine-independent.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("norm").alias("q_norm"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("norm").alias("c_norm"),
    )
    pairs = q.join(c, F.col("query_id") != F.col("neighbor_id"))
    # one Project (cosine computed in the select) instead of
    # withColumn-then-select: every DataFrame op re-analyzes the whole
    # tree eagerly, so fewer ops = cheaper construction (r11); the
    # optimizer collapsed the two Projects anyway — optimized plan
    # pinned identical in tests/test_expr_parity.py
    sim = pairs.select(
        "query_id", "neighbor_id",
        F.expr(_cosine_sql("q_vec", "c_vec", "q_norm", "c_norm"))
        .alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (sim.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") <= k))


def rademacher_weights(num_planes: int, dim: int) -> list[list[float]]:
    """±1 plane weights, weight_j of plane p = +1 iff the first hex
    nibble of md5("p_j") is >= 8.

    Derived ONCE driver-side (hashlib.md5 of an ASCII string is
    bit-identical to every engine's md5), then inlined as literals —
    the signature expression itself never hashes anything at runtime.
    """
    import hashlib

    return [
        [1.0 if int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[0], 16) >= 8
         else -1.0 for j in range(dim)]
        for p in range(num_planes)
    ]


def _plane_sign_bit_sql(vec_col: str, ws: list[float], dim: int) -> str:
    """SQL text of one hyperplane sign bit ('1'/'0') — the ONE
    definition both the single-table and multi-table sign-LSH build
    on, so the documented "table 0 reproduces lsh_cosine_topk exactly"
    recall-dominance property can't silently desynchronize.

    Emitted as SQL TEXT so callers can fold a whole H-plane signature
    into a single ``F.expr`` parse: the Column-API form (``F.array``
    of 64 ``F.lit`` weights + ``zip_with``/``aggregate`` lambdas)
    costs ~130 py4j round-trips per plane in classic mode
    (``F.lit(list)`` loops element-wise internally), which made plan
    CONSTRUCTION — not execution — the dominant cost of the sign-LSH
    bench queries.  The parsed expression tree is identical (the
    pround comparison uses :func:`pround_sql`, the exact text the
    oracles run), so the physical plan and results are unchanged."""
    lits = ",".join(repr(w) + "D" for w in ws)
    # array-level CAST outside the lambda (r11): HOF lambdas are
    # interpreted per element, so the old per-element CAST(x AS
    # DOUBLE) paid one extra node eval per (row, plane, dim); the
    # float->double widening is exact either way — identical bits
    dot = (f"aggregate(zip_with("
           f"CAST(slice(`{vec_col}`, 1, {dim}) AS ARRAY<DOUBLE>),"
           f" array({lits}), (x, w) -> x * w),"
           f" 0.0D, (acc, x) -> acc + x)")
    return f"CASE WHEN {pround_sql(dot, 9)} > 0 THEN '1' ELSE '0' END"


def hyperplane_sign_bits(df: DataFrame, vec_col: str, num_planes: int,
                         dim: int, out_col: str = "bucket") -> DataFrame:
    """Random-hyperplane signature as a '0'/'1' string of length H.

    Plane weights are ±1 derived from md5(plane‖dim) — deterministic,
    shared by every engine, and good enough for sign-LSH (Rademacher
    planes satisfy the Johnson–Lindenstrauss-style guarantees used by
    SimHash/sign-LSH in practice).  The weights are precomputed as
    literal arrays (:func:`rademacher_weights`), so the per-row work is
    one fused multiply-add over the vector per plane — H·d md5 calls
    per ROW (the naive form, ~384 hashes/row at H=6, d=64) become H·d
    hashes per QUERY PLAN, computed once on the driver.  The whole
    signature is ONE ``F.expr`` parse (see :func:`_plane_sign_bit_sql`).
    """
    weights = rademacher_weights(num_planes, dim)
    sig = ",".join(_plane_sign_bit_sql(vec_col, ws, dim) for ws in weights)
    return df.withColumn(out_col, F.expr(f"concat({sig})"))


def lsh_cosine_topk(corpus: DataFrame, queries: DataFrame, k: int, dim: int,
                    num_planes: int = 6, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    probe_hamming: int = 0) -> DataFrame:
    """Approximate top-k: exact cosine restricted to same-bucket pairs.

    ``probe_hamming=r`` enables multi-probe: each QUERY additionally
    probes every bucket within Hamming distance r of its own signature
    (every subset of ≤ r bit flips), recovering neighbors that fell
    just across one or two hyperplanes.  Candidate volume grows
    ×Σ_{i≤r} C(H,i) on the QUERY side only — the corpus is still
    bucketed once, so the production recall knob costs O(|Q|·H^r)
    extra probe rows, never a second corpus pass.  r is capped at H
    (flipping every bit) where the probe set is the whole keyspace.
    """
    from itertools import combinations

    qb = hyperplane_sign_bits(
        with_norm(queries, vec_col), vec_col, num_planes, dim
    ).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
             F.col("norm").alias("q_norm"), "bucket")
    if probe_hamming >= 1:
        def flipped(positions: tuple[int, ...]):
            out, cursor = [], 0
            for p in positions:
                if p > cursor:
                    out.append(F.substring("bucket", cursor + 1, p - cursor))
                out.append(
                    F.when(F.substring("bucket", p + 1, 1) == "1",
                           F.lit("0")).otherwise(F.lit("1")))
                cursor = p + 1
            if cursor < num_planes:
                out.append(F.substring("bucket", cursor + 1,
                                       num_planes - cursor))
            return F.concat(*out)

        radius = min(probe_hamming, num_planes)
        flips = [flipped(combo)
                 for r in range(1, radius + 1)
                 for combo in combinations(range(num_planes), r)]
        qb = (qb.withColumn("bucket",
                            F.explode(F.array(F.col("bucket"), *flips))))
    cb = hyperplane_sign_bits(
        with_norm(corpus, vec_col), vec_col, num_planes, dim
    ).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
             F.col("norm").alias("c_norm"), "bucket")
    pairs = qb.join(cb, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    sim = pairs.select(
        "query_id", "neighbor_id",
        F.expr(_cosine_sql("q_vec", "c_vec", "q_norm", "c_norm"))
        .alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (sim.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") <= k))


def lsh_cosine_topk_multitable(corpus: DataFrame, queries: DataFrame,
                               k: int, dim: int, num_planes: int = 6,
                               num_tables: int = 2, id_col: str = "vec_id",
                               vec_col: str = "embedding") -> DataFrame:
    """Multi-TABLE sign-LSH: ``num_tables`` independent hyperplane
    sets (table t uses global plane indices t·H..t·H+H-1, so table 0
    reproduces :func:`lsh_cosine_topk` exactly), candidate = same
    bucket in ANY table, exact cosine over the deduplicated candidate
    set.  The standard LSH recall lever orthogonal to multi-probe:
    recall rises with L because a near neighbor only has to agree on
    one table's H planes.

    Scale shape: each side is ONE frame of (id, table, bucket) rows —
    the signature stack is an explode over per-table bucket structs,
    so the corpus is scanned once regardless of L — and the candidate
    join is a (table, bucket) equi-join whose volume grows linearly in
    L, never a second corpus pass.  Weights are precomputed literals
    (:func:`rademacher_weights` over L·H planes), zero per-row hashing.
    """
    weights = rademacher_weights(num_tables * num_planes, dim)

    def bucket_struct_sql(t: int) -> str:
        bits = ",".join(
            _plane_sign_bit_sql(vec_col, weights[t * num_planes + p], dim)
            for p in range(num_planes))
        return f"named_struct('table', {t}, 'bucket', concat({bits}))"

    # the whole L-table signature stack is ONE expression parse
    tables = F.expr("array(" + ",".join(
        bucket_struct_sql(t) for t in range(num_tables)) + ")")

    def stacked(df: DataFrame, prefix: str) -> DataFrame:
        return (with_norm(df, vec_col)
                .select(F.col(id_col).alias(f"{prefix}_id"),
                        F.col(vec_col).alias(f"{prefix}_vec"),
                        F.col("norm").alias(f"{prefix}_norm"),
                        F.explode(tables).alias("tb"))
                .select(f"{prefix}_id", f"{prefix}_vec", f"{prefix}_norm",
                        F.col("tb.table").alias("table"),
                        F.col("tb.bucket").alias("bucket")))

    qb = stacked(queries, "query")
    cb = stacked(corpus, "neighbor").select("neighbor_id", "table", "bucket")
    cand = (qb.join(cb, ["table", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "query_vec", "query_norm", "neighbor_id")
            .dropDuplicates(["query_id", "neighbor_id"]))
    vecs = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"), F.col("norm").alias("c_norm"))
    sim = (cand.join(vecs, "neighbor_id")
           .select("query_id", "neighbor_id",
                   F.expr(_cosine_sql("query_vec", "c_vec",
                                      "query_norm", "c_norm"))
                   .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (sim.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") <= k))


def fold_centroids(centroids: DataFrame,
                   vec_col: str = "embedding") -> DataFrame:
    """The k-row centroid table folded into ONE array row — the form
    :func:`ivf_assign` broadcasts.  Exposed (r12) so a plan with
    several assignments over the SAME trained table builds the fold
    once and passes it via ``prefolded`` (each fold chain costs py4j
    round-trips at construction; the folded trees were already
    identical, so runtime plans are unchanged)."""
    return (centroids.coalesce(1)
            .agg(F.expr(f"collect_list(struct(cluster_id, "
                        f"CAST(`{vec_col}` AS ARRAY<DOUBLE>) AS c_vec))")
                 .alias("__cents")))


def ivf_assign(df: DataFrame, centroids: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding", nprobe: int = 1,
               prefolded: DataFrame | None = None) -> DataFrame:
    """IVF coarse quantization: assign every vector to its ``nprobe``
    nearest centroids (one output row per probed cell).

    ``centroids`` is a tiny (cluster_id, centroid vector) table.  It is
    folded into ONE array row (``coalesce(1)`` first, so the k-row
    aggregate needs no SinglePartition exchange), broadcast, and each
    vector ranks the k cells with a pure per-row expression:
    ``array_sort`` over (pround(d2, 9), cluster_id) structs, then
    ``slice``+``explode`` of the first ``nprobe``.  One pass over the
    corpus, cost |corpus|·K·d — and, since r11, ZERO shuffle: the
    r1–r10 form ranked with ``row_number`` over a per-vector window,
    whose Exchange moved |corpus|·K rows each carrying TWO d-float
    vectors (measured 64x: 4M rows / ~4.2 GB, 40 s of map-side
    serialize CPU — the single largest stage of the ANN plan; guide
    §2.4 "remove shuffles outright").  ``array_sort`` on the struct
    compares (d, cluster_id) ascending — exactly the old window's
    ORDER BY, so the selected cells are identical row for row; explode
    of the sliced array yields one row per probed cell and drops rows
    only when the centroid table is empty, matching the old crossJoin.

    Corpus vectors are stored with nprobe=1 (each lives in ONE cell);
    queries probe nprobe>1 cells at search time — the standard IVF
    recall knob, paid per query, never as corpus duplication.

    pround (floor-form), NOT F.round: the oracle CTEs rank on
    floor(d2*1e9+0.5)/1e9 while F.round is BigDecimal HALF_UP on the
    double's decimal string — the two can disagree on d2 values near
    a .5e-9 boundary, and once training reads assignments (r9), a
    single flipped row cascades into different trained centroids and
    a full digest mismatch (ADVICE r9, medium).  One shared formula,
    both engines.
    """
    c_arr = (prefolded if prefolded is not None
             else fold_centroids(centroids, vec_col))
    # d2 in two cheap interpreted passes: zip_with computes the diffs,
    # aggregate squares-and-sums them.  Same left-to-right summation,
    # same element values as the old ((x-y)*(x-y)) lambda — which
    # re-evaluated the subtraction AND two casts per element because
    # interpreted HOF eval does no CSE (~8 node evals/element -> 3).
    # The whole ranked expression is ONE F.expr parse: the Column-API
    # form (nested transform/zip_with/aggregate Python lambdas) cost
    # ~200 py4j round-trips per ivf_assign — ×4 per ANN plan (corpus,
    # query, one per Lloyd step), making plan CONSTRUCTION ~1/3 of the
    # sf0.1 wall.  The parsed tree is canonically identical
    # (sameSemantics-pinned in tests); the d struct field is pround
    # (floor-form) at 1e-9, spelled inline.
    d2 = (f"aggregate(zip_with(CAST(`{vec_col}` AS ARRAY<DOUBLE>), "
          f"cell.c_vec, (a, b) -> a - b), 0.0D, (acc, d) -> acc + d * d)")
    ranked = F.expr(
        f"array_sort(transform(__cents, cell -> "
        f"struct(floor(({d2}) * 1000000000 + 0.5D) / 1000000000 AS d, "
        f"cell.cluster_id AS cluster_id)))")
    out_cols = [F.col(n) for n in df.columns]
    # two Projects, not three (withColumn+drop folded into one select):
    # each op re-analyzes the whole tree eagerly — optimized plan pinned
    # identical in tests/test_expr_parity.py
    probed = (df.crossJoin(F.broadcast(c_arr))
              .select(*out_cols,
                      F.explode(F.slice(ranked, 1, nprobe)).alias("__probe")))
    return probed.select(*[F.col(n) for n in df.columns],
                         F.col("__probe.cluster_id").alias("cluster_id"))


def _lloyd_step(df: DataFrame, centroids: DataFrame, id_col: str,
                vec_col: str, quantize: int | None = None,
                dim: int | None = None) -> DataFrame:
    """ONE Lloyd's iteration as a pure (lazy) DataFrame transform:
    assign every vector to its nearest centroid (broadcast cross, the
    :func:`ivf_assign` kernel), recompute each cell's element-wise
    mean, and keep the previous centroid for any cell that went empty
    (standard Lloyd's fallback; k never shrinks).  No action is
    triggered — callers choose between the driver-hop form
    (:func:`kmeans_refine`, flat plans for many iterations) and the
    fully-lazy form (:func:`kmeans_refine_lazy`, zero jobs until the
    result is consumed).

    ``quantize``: round each mean component with pround(·, quantize)
    (the portable floor-form).  Float SUMMATION ORDER differs between
    engines (and between partitionings), so raw means drift a few
    ulps; quantizing at 1e-9 pins both engines — and any cluster
    layout — to identical centroid bits, which is what lets a DuckDB
    oracle replay the trained quantizer exactly
    (embedding_ann_production since r9).

    ``dim``: when the vector width is KNOWN (and every row is exactly
    that wide — the embeddings fixture contract), the per-cell mean is
    computed as ``dim`` per-position ``avg(vec[i])`` columns in ONE
    groupBy(cluster_id) instead of posexplode → groupBy(cluster_id,
    pos) → groupBy(cluster_id) (r12, guide §2.3/§2.4): no ×dim row
    multiplication, one Exchange per iteration instead of two, and no
    collect_list/array_sort reconstruction.  Per-position averages are
    over the identical value sets (an array element is NULL-skipped
    exactly like a missing posexplode row), and each mean is quantized
    with the same floor-form, so the trained centroids match the
    generic path on every fixture (row-equality pinned in
    tests/test_expr_parity.py; all oracle sweeps re-run green)."""
    assigned = ivf_assign(df.select(id_col, vec_col), centroids,
                          id_col=id_col, vec_col=vec_col, nprobe=1)
    # the (quantized) mean is ONE F.expr parse (construction cost, r11;
    # sameSemantics-pinned in tests/test_expr_parity.py)
    def _q(sql: str) -> str:
        if quantize is None:
            return sql
        scale = 10 ** quantize
        return f"floor({sql} * {scale} + 0.5D) / {scale}"
    if dim is not None:
        mean_arr = ", ".join(
            _q(f"avg(CAST(`{vec_col}`[{i}] AS DOUBLE))")
            for i in range(dim))
        means = (assigned.groupBy("cluster_id")
                 .agg(F.expr(f"array({mean_arr})").alias("__new")))
    else:
        means = (assigned
                 .select("cluster_id", F.posexplode(vec_col))
                 .groupBy("cluster_id", "pos")
                 .agg(F.expr(_q("avg(CAST(col AS DOUBLE))")).alias("v"))
                 .groupBy("cluster_id")
                 .agg(F.expr("transform(array_sort(collect_list("
                             "struct(pos, v))), s -> s.v)").alias("__new")))
    return (centroids.select("cluster_id", F.col(vec_col))
            .join(means, "cluster_id", "left")
            .select("cluster_id",
                    F.coalesce(F.col("__new"), F.col(vec_col))
                    .alias(vec_col)))


def kmeans_refine_lazy(df: DataFrame, centroids: DataFrame,
                       n_iter: int = 3, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       quantize: int | None = None,
                       persist_steps: bool = False,
                       step_cache: list[DataFrame] | None = None,
                       dim: int | None = None) -> DataFrame:
    """Lloyd's-iteration refinement with NO driver hops: the centroid
    table stays a lazy DataFrame through every iteration, so building
    the plan launches zero Spark jobs (VERDICT r7 #3 — registered
    queries must return lazy plans; the eager exception is gone).

    The plan nests one broadcast-cross + aggregate per iteration;
    identical centroid sub-plans referenced more than once are
    deduplicated by Spark's ReuseExchange rule, and the centroid
    tables are k·d scalars, so the nesting is cheap for the small,
    fixed iteration counts a coarse-quantizer trainer uses (≤ ~5).
    For long training runs prefer :func:`kmeans_refine`, which
    flattens lineage with an O(k·d) driver hop per iteration (the
    MLlib pattern).

    ``quantize`` (forwarded to :func:`_lloyd_step`): pround each mean
    at 10^-quantize so the trained centroids are bit-identical across
    engines and partitionings — required when an SQL oracle replays
    the training.

    ``persist_steps``: mark each iteration's (k·d)-float centroid
    table with ``persist()`` — still zero jobs at construction (the
    cache fills on first use), but every LATER reference becomes an
    in-memory scan instead of a re-derivation.  Without it a consumer
    that references the trained table twice (e.g. corpus + query
    assignment in embedding_ann_production) re-expands the whole
    nested training lineage per reference — the plan grows
    exponentially in n_iter (measured: 27 windows / 35 exchanges for
    n_iter=2 consumed twice, vs 5/8 persisted).  This is the same
    iterative-lineage discipline dedup_clusters applies with
    localCheckpoint, at k·d-scalar cost.

    Cache lifetime (ADVICE r9, tracked-release r11): a lazy builder
    cannot know when its consumer is done, and eager unpersist of step
    i would re-trigger the very re-derivation the persist exists to
    prevent — so the step tables stay persisted by default.  Each
    entry is k·d floats (~16 KB at k=32, d=64), so the cost per
    invocation is negligible; one-shot harnesses (bench.py, the
    driver's per-query loop) bound the accumulation with
    ``spark.catalog.clearCache()`` between plans.  A LONG-LIVED
    service that builds many trained quantizers should instead pass
    ``step_cache`` (any list): every persisted step DataFrame is
    appended to it, and :func:`release_kmeans_steps` unpersists them
    once the trained table has been materialized — targeted release,
    no collateral cache eviction."""
    cur = centroids.select("cluster_id", F.col(vec_col))
    for _ in range(n_iter):
        cur = _lloyd_step(df, cur, id_col, vec_col, quantize=quantize,
                          dim=dim)
        if persist_steps:
            cur = cur.persist()
            if step_cache is not None:
                step_cache.append(cur)
    return cur


def release_kmeans_steps(step_cache: list[DataFrame]) -> None:
    """Unpersist every step table collected via ``step_cache`` and
    empty the list.  Call AFTER the trained centroid table (or any
    plan built on it) has been materialized — releasing earlier turns
    later references back into full lineage re-derivations."""
    for step in step_cache:
        step.unpersist()
    step_cache.clear()


def kmeans_refine(df: DataFrame, centroids: DataFrame,
                  n_iter: int = 3, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Lloyd's-iteration refinement of IVF coarse centroids — train the
    quantizer instead of trusting the seeds.

    Each iteration: assign every vector to its nearest centroid
    (broadcast cross, same kernel as :func:`ivf_assign`), recompute
    each cell's element-wise mean, and pull the tiny (k, d) centroid
    table back to the driver so the next iteration starts from a flat
    plan — the MLlib pattern: cluster-side passes are O(|corpus|·k·d)
    scans, driver state is O(k·d) floats, and lineage never stacks
    iteration over iteration.  Ties in the assignment break by
    cluster_id, collect order is canonicalized by position sort, so
    two runs produce identical centroids (pinned in tests).

    An empty cell keeps its previous centroid (standard Lloyd's
    fallback; k never shrinks).  Iterative, so the placement is not
    SQL-expressible — the embedding_ivf_kmeans driver row verifies the
    WCSS-monotone invariant via per-iteration flags (r5); determinism
    is asserted in pytest.
    """
    cur = centroids.select("cluster_id", F.col(vec_col))
    for _ in range(n_iter):
        stepped = _lloyd_step(df, cur, id_col, vec_col)
        merged = sorted(
            (r["cluster_id"], list(r[vec_col])) for r in stepped.collect())
        cur = df.sparkSession.createDataFrame(
            merged, f"cluster_id int, {vec_col} array<double>")
    return cur


def kmeans_wcss_df(df: DataFrame, centroids: DataFrame,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Within-cluster sum of squares under nearest-centroid assignment
    — the quantity Lloyd's iterations never increase — as a LAZY
    one-row, one-column (``wcss`` double) aggregate, composable into
    a larger plan without launching a job.  SUM over an empty frame
    is NULL; an empty corpus has WCSS 0.0, so coalesce keeps
    monotonicity comparisons well-typed (ADVICE r5)."""
    assigned = ivf_assign(df.select(id_col, vec_col), centroids,
                          id_col=id_col, vec_col=vec_col, nprobe=1)
    # same fast d2 form as ivf_assign (r11): row-level double casts,
    # diff pass + square-sum pass — bit-identical, fewer node evals
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"),
                   F.col("c_vec_kept").cast("array<double>"),
                   lambda x, y: x - y),
        F.lit(0.0), lambda acc, d: acc + d * d)
    cent = centroids.select(F.col("cluster_id"),
                            F.col(vec_col).alias("c_vec_kept"))
    return (assigned.join(cent, "cluster_id")
            .select(d2.alias("d2"))
            .agg(F.coalesce(F.sum("d2"), F.lit(0.0)).alias("wcss")))


def kmeans_wcss(df: DataFrame, centroids: DataFrame,
                id_col: str = "vec_id", vec_col: str = "embedding") -> float:
    """Eager scalar form of :func:`kmeans_wcss_df` (one driver hop)."""
    return float(kmeans_wcss_df(df, centroids, id_col=id_col,
                                vec_col=vec_col).collect()[0]["wcss"])


def int8_quantize_stats(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Per-vector symmetric int8 quantization audit: scale =
    max|x|/127, q = round-half-up(x/scale), and the reconstruction
    error stats (max abs error, MSE) a storage-compression rollout
    needs before switching an embedding store to int8.

    One stateless projection — array expressions only, no shuffle, no
    UDF; at 100 TB it runs at scan speed.  Rounding uses the portable
    floor(x+0.5) form so the DuckDB oracle reproduces every bit.
    """
    x = F.transform(F.col(vec_col), lambda e: e.cast("double"))
    staged = df.select(F.col(id_col), x.alias("_x"))
    scale = (F.aggregate("_x", F.lit(0.0),
                         lambda acc, e: F.greatest(acc, F.abs(e)))
             / F.lit(127.0))
    staged = staged.withColumn("_scale", scale)
    err = F.when(
        F.col("_scale") > 0,
        F.transform("_x", lambda e: F.abs(
            F.floor(e / F.col("_scale") + F.lit(0.5)) * F.col("_scale") - e))
    ).otherwise(F.transform("_x", lambda e: F.lit(0.0)))
    staged = staged.withColumn("_err", err)
    from ..functions.rounding import pround
    n = F.size("_x")
    return staged.select(
        F.col(id_col),
        pround(F.col("_scale"), 8).alias("scale"),
        pround(F.aggregate("_err", F.lit(0.0),
                           lambda acc, e: F.greatest(acc, e)), 8)
            .alias("max_abs_err"),
        # n == 0 guard: sum/size would be 0/0 → NULL for an empty
        # vector while the SQL twin's unnest drops the row entirely;
        # both sides pin the empty-vector row to mse 0.0 instead
        pround(F.when(n > 0,
                      F.aggregate("_err", F.lit(0.0),
                                  lambda acc, e: acc + e * e) / n)
               .otherwise(F.lit(0.0)), 10).alias("mse"),
    )
