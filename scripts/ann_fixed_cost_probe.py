"""Decompose embedding_ann_production's sf0.1 wall (OPTIMIZATION_r11
"Not yet optimized" #1): how much is plan construction / optimization
vs training materialization vs the search itself.

Bench methodology parity: same session factory, noop sink, warm run
first, setJobDescription labels.  Run on an idle box.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ecommerce_data_engineering_spark.session import get_spark
from ecommerce_data_engineering_spark.plans import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAME = "embedding_ann_production"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main():
    spark = get_spark("ann-fixed-cost-probe")
    sc = spark.sparkContext
    spec = REGISTRY[NAME]
    res: dict = {"sf_dir": SF_DIR}

    # global warmup: two real plans, like bench.py
    for wname in list(n for n, s in REGISTRY.items() if s.bench)[:2]:
        noop(REGISTRY[wname].fn(spark, SF_DIR))
    spark.catalog.clearCache()

    # 1) full query, bench-style: warm run then 5 timed runs (cache NOT
    #    cleared between runs -- bench.py clears only after the query's
    #    whole sampling window)
    sc.setJobDescription("probe: full query warm")
    noop(spec.fn(spark, SF_DIR))
    runs = []
    for i in range(5):
        sc.setJobDescription(f"probe: full query timed {i}")
        dt, _ = timed(lambda: noop(spec.fn(spark, SF_DIR)))
        runs.append(round(dt, 3))
    res["full_runs"] = runs

    # 2) construction only (no action) on the warm session
    cons = []
    for i in range(5):
        dt, df = timed(lambda: spec.fn(spark, SF_DIR))
        cons.append(round(dt, 3))
    res["construct_only"] = cons

    # 3) optimization cost: explain() of a freshly built plan
    expl = []
    for i in range(3):
        df = spec.fn(spark, SF_DIR)
        dt, _ = timed(lambda: df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")))
        expl.append(round(dt, 3))
    res["explain_only"] = expl

    # 4) cold-cache full run (clearCache before each): includes training
    cold = []
    for i in range(3):
        spark.catalog.clearCache()
        sc.setJobDescription(f"probe: full query cold {i}")
        dt, _ = timed(lambda: noop(spec.fn(spark, SF_DIR)))
        cold.append(round(dt, 3))
    res["cold_runs"] = cold

    # 5) training subtree alone (trained centroid table), cold + warm
    from ecommerce_data_engineering_spark.plans.extensions import (
        PROD_IVF_K, PROD_SEED_STEP, PROD_TRAIN_ITERS, PROD_TRAIN_SAMPLE_FRAC,
        PROD_TRAIN_SAMPLE_SEED, _seed_centroids)
    from ecommerce_data_engineering_spark.operators.sampling import (
        sample_predicate)
    from ecommerce_data_engineering_spark.operators.similarity import (
        kmeans_refine_lazy)
    from ecommerce_data_engineering_spark.sources import load
    from pyspark.sql import functions as F

    def trained():
        emb = load(spark, SF_DIR, "embeddings")
        cents = _seed_centroids(emb, PROD_IVF_K, PROD_SEED_STEP)
        train_df = emb.filter(sample_predicate(
            F.col("vec_id"), PROD_TRAIN_SAMPLE_FRAC,
            seed=PROD_TRAIN_SAMPLE_SEED))
        return kmeans_refine_lazy(train_df, cents, n_iter=PROD_TRAIN_ITERS,
                                  quantize=9, persist_steps=True)

    spark.catalog.clearCache()
    sc.setJobDescription("probe: training cold")
    dt, _ = timed(lambda: noop(trained()))
    res["train_cold"] = round(dt, 3)
    warm_tr = []
    for i in range(3):
        sc.setJobDescription(f"probe: training warm {i}")
        dt, _ = timed(lambda: noop(trained()))
        warm_tr.append(round(dt, 3))
    res["train_warm"] = warm_tr

    print(json.dumps(res))


if __name__ == "__main__":
    main()
