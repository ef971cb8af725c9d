"""Regenerate EXPLAINS.md — formatted physical plans of representative
queries at sf0.1 (evidence that pushdown/broadcast/top-k plans hold)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_data_engineering_spark.session import get_spark
from ecommerce_data_engineering_spark.plans import REGISTRY

KEY = ["pricing_summary", "revenue_by_nation", "top_products",
       "campaign_attribution_scalable", "dedup_minhash_lsh",
       "embedding_cosine_topk", "customer_metrics", "fact_orders_upsert",
       "corpus_deterministic_sample", "corpus_sequence_packing",
       "corpus_curation_funnel"]


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
        out += [f"## {name}", "```", *lines[:tree_end], "...", *detail, "```", ""]
    open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EXPLAINS.md"), "w").write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
