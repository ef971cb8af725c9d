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
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        # a shared non-key name would make bypass's withColumn OVERWRITE
        # left's column (branch column counts diverge, unionByName
        # throws later with an opaque error) — fail with the cause
        raise ValueError(
            f"null_safe_left_join: non-key columns {sorted(overlap)} "
            f"exist on both sides; rename or drop before joining")
    matchable = left.filter(F.col(key).isNotNull()).join(right, key, "left")
    bypass = left.filter(F.col(key).isNull())
    for c in right.columns:
        if c != key:
            bypass = bypass.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    return matchable.unionByName(bypass)


def salted_join(left: DataFrame, right: DataFrame, key: str, n_salts: int = 8,
                how: str = "inner",
                salt_cols: list[str] | None = None) -> DataFrame:
    """Equi-join with the left key salted across ``n_salts`` reducers.

    Salt is xxhash64 over the left row — deterministic per row
    content, which matters: a nondeterministic salt (rand,
    monotonically_increasing_id) feeding a shuffle key is the classic
    lost/duplicated-rows-on-stage-retry hazard, because the recomputed
    map task salts rows differently from the copies reducers already
    fetched.  By default every HASHABLE left column feeds the salt;
    map-typed payload columns are skipped (Spark cannot hash MapType —
    UNSUPPORTED_FEATURE.HASH_MAP_TYPE would fail the whole plan at
    analysis time, ADVICE r3), or pass ``salt_cols`` to pin the
    discriminator set explicitly.  Tradeoff: left rows identical on
    the salted columns share a salt (they cannot be told apart
    deterministically), so a hot key whose skew is PURE row
    duplication still lands on one reducer — spread those upstream
    with a real discriminator column.  The right side is exploded once
    per salt — right must be the smaller input.

    Only inner/left-flavored joins are supported: the right side is
    replicated n_salts times, so any flavor that emits unmatched RIGHT
    rows (right/full outer) would emit them once per replica.
    """
    allowed = {"inner", "left", "leftouter", "left_outer",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated "
            f"right side would emit unmatched right rows once per salt; "
            f"use one of {sorted(allowed)}")
    if salt_cols is None:
        # xxhash64 rejects any type CONTAINING a map (not just top-level
        # maps): array<map<...>>, struct with a map field, etc. — so the
        # filter is substring, not prefix (ADVICE r4).
        salt_cols = [c for c, t in left.dtypes if "map<" not in t]
    if not salt_cols:
        raise ValueError(
            "salted_join: no hashable salt columns (every left column "
            "is map-typed, or salt_cols=[]) — a constant salt would "
            "put the hot key back on one reducer; name a hashable "
            "discriminator")
    salt = (F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
                   F.lit(n_salts))).cast("int")
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
