"""Skew-mitigation operators (SURVEY.md §7.4.8).

The reference's clickstream has 30% NULL customer_id (anonymous) —
joined naively, every NULL lands in one reducer; a hot natural key
does the same.  Two standing remedies beyond AQE's runtime skew-join:

- ``null_safe_left_join``: split NULL-key rows out *before* the join
  (they can never match) and union them back — removes the giant NULL
  key from the shuffle entirely.
- ``salted_join``: replicate the (small) right side N ways and salt
  the left key deterministically, spreading a hot key over N reducers.
  Result is identical to the plain join (each left row meets exactly
  one replica of its key's right rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def null_safe_left_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """Left join that never shuffles NULL keys: matchable rows join,
    NULL-key rows bypass with right columns NULLed."""
    matchable = left.filter(F.col(key).isNotNull()).join(right, key, "left")
    bypass = left.filter(F.col(key).isNull())
    for c in right.columns:
        if c != key:
            bypass = bypass.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    return matchable.unionByName(bypass)


def salted_join(left: DataFrame, right: DataFrame, key: str, n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join with the left key salted across ``n_salts`` reducers.

    Salt is derived from a hash of the whole left row key + a stable
    row fingerprint (xxhash64 of the key alone would re-collide, so we
    spread by monotonically varying content via ``spark_partition_id``-
    free arithmetic on the key hash).  The right side is exploded once
    per salt — right must be the smaller input.
    """
    salt = (F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()),
                   F.lit(n_salts))).cast("int")
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
