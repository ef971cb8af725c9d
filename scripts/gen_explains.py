"""Regenerate EXPLAINS.md — formatted physical plans of representative
queries at sf0.1 (evidence that pushdown/broadcast/top-k plans hold)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_data_engineering_spark.session import get_spark
from ecommerce_data_engineering_spark.plans import REGISTRY

KEY = ["pricing_summary", "revenue_by_nation", "top_products",
       "campaign_attribution_scalable", "dedup_minhash_lsh",
       "embedding_cosine_topk", "embedding_ann_lsh",
       "embedding_ann_production",
       "customer_metrics", "fact_orders_upsert",
       "corpus_deterministic_sample", "corpus_sequence_packing",
       "corpus_curation_funnel", "corpus_decontaminate",
       "corpus_mix_rebalance", "corpus_chunk_dedup",
       "corpus_leakage_safe_split",
       "snapshot_cdc_diff", "cdc_incremental_metrics",
       "dedup_jaccard_prefix", "revenue_rollup"]

# Plan-shape commentary kept alongside the regenerated plans (the
# script owns these so re-running never loses them).
NOTES = {
    "customer_metrics": (
        "No explicit broadcast hint (r02 finding 3): o_agg is "
        "customer-grain, so a forced broadcast would scale with the "
        "probe side.  AQE picks BroadcastHashJoin at fixture scale from "
        "runtime sizes and falls back to a co-partitioned shuffle join "
        "when the aggregate outgrows the threshold; pinned in "
        "tests/test_physical.py::test_rollup_join_broadcasts_via_aqe_without_hint."),
    "corpus_curation_funnel": (
        "The quality gate is one lambda-bound expression "
        "(operators/text.gopher_gate): no persisted stats frame, no "
        "InMemoryTableScan, single tokenization per document — pinned in "
        "tests/test_physical.py::test_curation_funnel_gate_is_cache_free_single_tokenization."),
    "dedup_minhash_lsh": (
        "Signatures use one 28-bit md5 digest per shingle fed through a "
        "universal-hash family (a_i*x+b_i mod 2^31-1) — 8x fewer digests "
        "than salted-md5 minhash on the exploded shingle frame.  "
        "Jaccard verification semi-joins shingles down to candidate "
        "documents (broadcast id set) and compresses shingles to 60-bit "
        "long keys, so the corpus shingle table is never re-shuffled "
        "for the intersection join."),
    "embedding_ann_lsh": (
        "Sign-LSH bucketing: the ±1 hyperplane weights are md5-derived "
        "but precomputed driver-side and inlined as literal arrays "
        "(operators/similarity.rademacher_weights), so the signature is "
        "one multiply-add pass per plane with ZERO per-row hashing — "
        "the plan shows plain array literals, no md5 call.  Bucket "
        "equi-join, exact cosine within buckets, per-query window "
        "top-k; never all-pairs."),
    "embedding_ann_production": (
        "The deployable ANN operating point (VERDICT r7 #2, retrained "
        "r8 #2): IVF with 32 cells refined by two quantized Lloyd's "
        "iterations, queries probing their 14 nearest cells — training "
        "buys recall per probe (higher recall than the r8 seed point "
        "at a 12.5% smaller candidate budget; floor pinned in "
        "tests/test_recall_evidence.py, numbers in evidence/RECALL."
        "json).  Each training step's (k*d)-float centroid table is "
        "persisted so reuse is an in-memory scan, not a lineage "
        "re-expansion.  Plan shape stays the IVF family's: centroid "
        "broadcast cross + per-vector rank to assign cells, then a "
        "cluster_id equi-join — candidate generation is never "
        "all-pairs, and raising recall costs probes (a constant), not "
        "plan changes."),
    "corpus_decontaminate": (
        "Shingles compress to 64-bit md5-prefix keys before the join; "
        "with a benchmark-sized eval set the eval side auto-broadcasts "
        "and the corpus never shuffles.  The compact (doc_id, key, "
        "split) frame is persisted because both sides of the join "
        "consume it with different pushed-down split filters — without "
        "the barrier the corpus-wide shingle explode would run twice."),
    "corpus_mix_rebalance": (
        "One groupBy(source) with map-side partials plus a 1-row scalar "
        "broadcast cross for the total — the corpus is scanned once."),
    "corpus_leakage_safe_split": (
        "The one-scan two-exchange shape the docstring claims: the "
        "parquet scan reads only (doc_id, text); the content "
        "fingerprint, both split labels and the partial aggregate all "
        "run inside the first WholeStageCodegen, so the first Exchange "
        "carries (fp md5, split, partial counts) — never text — and "
        "the second carries one row per fingerprint group.  No joins, "
        "no window; group keys are uniformly md5-distributed so no "
        "salting is needed at any scale."),
    "corpus_chunk_dedup": (
        "Document text never shuffles: two narrow Exchanges only — "
        "groupBy(chunk md5) for global count + first sighting, and the "
        "dropped-position regroup by doc id; reassembly filters the "
        "chunk array in place on the original row.  The staged "
        "word-split+chunk projection is persisted (InMemoryRelation "
        "below), so the dominant per-row cost runs once for its three "
        "consumers instead of three times.  Pinned in "
        "tests/test_physical.py::test_chunk_dedup_shuffles_positions_not_text."),
    "cdc_incremental_metrics": (
        "Incremental aggregate maintenance: the refresh shuffle is over "
        "|groups| + 2·|changes| rows (the prev-aggregate union the "
        "diff's debit/credit deltas) — the fact table appears only in "
        "the diff's one full-outer join, never in the metric fold.  "
        "Measures stay scaled-long through the +/− algebra."),
    "revenue_rollup": (
        "ROLLUP runs over the (year, quarter) pre-aggregate, not the "
        "fact: Expand sits above the grain HashAggregate and touches "
        "~|year×quarter| rows instead of emitting every order row 3x "
        "ahead of the partial aggregate (decimal sums are associative, "
        "so summing per-grain sums is bit-identical).  At 100 TB the "
        "difference is 3x the scan-side CPU.  Pinned in tests/"
        "test_physical.py::test_revenue_rollup_expands_aggregate_not_fact."),
    "dedup_jaccard_prefix": (
        "Exact set-similarity via prefix filtering (SSJoin/PPJoin): "
        "document frequency join + per-document window rank, then the "
        "inverted-index self-join runs ONLY over each document's "
        "rarest |X|−⌈t·|X|⌉+1 shingles — corpus-hot shingles never "
        "generate candidates.  Result provably equals the exhaustive "
        "join; the driver oracle is the exhaustive SQL, so the hash "
        "match is the no-missed-pairs proof."),
    "snapshot_cdc_diff": (
        "Keyed CDC is ONE full-outer SortMergeJoin: both snapshots "
        "hash-partition by the key, payload columns travel as a single "
        "struct per side, and the insert/delete/update classification "
        "plus the unchanged-row discard evaluate inside the join stage "
        "— no exchange after the join.  Pinned in "
        "tests/test_cdc.py::test_snapshot_diff_plan_single_join_no_extra_exchange.  "
        "r5 watch-query root cause (VERDICT r4 #4): the r4 +0.2 s on "
        "this query (with daily_sales +0.3, revenue_by_nation +0.25) "
        "held under clean n=5 stock-fixture medians (0.58/0.99/1.29 s) "
        "but vanishes on the 8-row-group fixture copy "
        "(0.44/0.62/0.94 s — r3 levels), and a bare full-scan probe "
        "shows the same stock-vs-rg8 decode delta with no plan change: "
        "the drift is single-thread parquet decode of the regenerated "
        "single-row-group fixtures, not a plan property."),
}


def main():
    spark = get_spark("explains", cpus=8)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = ["# EXPLAINS — physical plans of representative queries (sf0.1)", ""]
    for name in KEY:
        plan = REGISTRY[name].fn(spark, sf)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        lines = plan.splitlines()
        tree_end = next((i for i, l in enumerate(lines) if l.strip() == ""),
                        len(lines))
        detail = [l for l in lines[tree_end:]
                  if any(k in l for k in ("PushedFilters", "ReadSchema",
                                          "Join type"))][:14]
        note = [NOTES[name], ""] if name in NOTES else []
        out += [f"## {name}", *note,
                "```", *lines[:tree_end], "...", *detail, "```", ""]
    open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EXPLAINS.md"), "w").write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
