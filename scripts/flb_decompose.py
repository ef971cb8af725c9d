"""Decompose fact_lineitem_build's cost at a scaled fixture (VERDICT
r11 #3, guide §1): time the scans, the big orderkey join alone, and
the full query with the noop sink, fresh plans, clearCache() between
runs.  Prints one JSON object to stdout (progress to stderr).

    python scripts/flb_decompose.py /tmp/sf_64x
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_data_engineering_spark.plans import REGISTRY  # noqa: E402
from ecommerce_data_engineering_spark.session import get_spark  # noqa: E402
from ecommerce_data_engineering_spark.sources.readers import load  # noqa: E402

N = int(os.environ.get("FLB_N", "3"))

LI_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
           "l_quantity", "l_extendedprice", "l_discount"]
O_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_64x"
    spark = get_spark("flb_decompose")
    out: dict[str, dict] = {}

    def timeit(label: str, mk) -> None:
        mk().write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(N):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[label] = {"min": min(runs), "runs": runs}
        print(f"  {label}: {out[label]}", file=sys.stderr, flush=True)

    def join_only():
        li = load(spark, sf, "lineitem").select(*LI_COLS)
        o = load(spark, sf, "orders").select(*O_COLS)
        return li.join(o, li.l_orderkey == o.o_orderkey)

    timeit("scan_lineitem_7cols", lambda: load(spark, sf, "lineitem")
           .select(*LI_COLS))
    timeit("scan_orders_4cols", lambda: load(spark, sf, "orders")
           .select(*O_COLS))
    timeit("li_join_orders", join_only)
    timeit("full_query", lambda: REGISTRY["fact_lineitem_build"].fn(spark, sf))
    print(json.dumps({"fixture": sf, "pieces": out}))
    spark.stop()


if __name__ == "__main__":
    main()
