"""Scratch diagnostic for campaign_attribution_scalable regression (round 4)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from ecommerce_data_engineering_spark.plans import REGISTRY
from ecommerce_data_engineering_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def timeq(spark, name, n=5):
    spec = REGISTRY[name]
    spec.fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        spec.fn(spark, SF).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples


def main():
    spark = get_spark("diag")
    for name in ("campaign_attribution", "campaign_attribution_scalable"):
        s = timeq(spark, name)
        print(name, "median=%.3f min=%.3f all=%s" % (s[len(s)//2], s[0], [round(x, 3) for x in s]))
    REGISTRY["campaign_attribution_scalable"].fn(spark, SF).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
