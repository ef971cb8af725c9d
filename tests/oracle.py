"""Local differential harness mirroring the driver's t2 check:
run the Spark query and the DuckDB oracle on the same parquet, compare
row count + column names + order-insensitive values (columns sorted by
name, rows sorted by their stringified tuple).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _connect():
    """One DuckDB connection per oracle run.  SPARK_GRAFT_DUCK_MEM
    (e.g. '24GB') caps the connection's memory_limit — DuckDB defaults
    to ~80% of RAM PER PROCESS, so two concurrent all-pairs oracle
    sweeps OOM each other without it (seen live in r9: a 16x simhash
    oracle died with 'Failed to allocate block' while two embedding
    all-pairs sweeps ran alongside).  Also points temp_directory at
    TMPDIR so capped runs can spill instead of failing."""
    con = duckdb.connect()
    mem = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit = '{mem}'")
        con.execute(f"SET temp_directory = "
                    f"'{os.environ.get('TMPDIR', '/tmp')}/duckspill'")
    return con


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = _connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _norm_cell(v) -> str:
    import numpy as np

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "∅"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):          # date/datetime → midnight-normalized
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _dtype_family(series: pd.Series) -> str:
    """Collapse a pandas dtype to the family the driver's hash is
    sensitive to.  The driver stringifies raw cells, so int64 ``699``
    vs float64 ``699.0`` hash-differ even when values are identical
    (the round-2 curation failure: DuckDB sum(BIGINT) → HUGEINT →
    float64).  _norm_cell masks that locally; this check un-masks it."""
    import numpy as np

    kind = series.dtype.kind
    if kind == "b":
        return "bool"
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind in "mM":
        return "datetime"
    # object column: classify by first non-null value
    for v in series:
        if v is None or v is pd.NaT:
            continue
        if isinstance(v, float) and math.isnan(v):
            continue
        import datetime
        import decimal
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (bool, np.bool_)):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, datetime.datetime):
            return "datetime"
        if isinstance(v, datetime.date):
            return "date"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "list"
        return "str"
    return "all-null"


def dtype_problems(spdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                   name: str) -> list[str]:
    """Driver-strict column-type check: flag any column whose dtype
    family differs between the Spark result and the DuckDB oracle
    (e.g. oracle HUGEINT/DECIMAL where Spark emits int64/double).
    An all-null column on either side is compatible with anything."""
    out = []
    for c in sorted(set(spdf.columns) & set(oracle_pdf.columns)):
        fa, fb = _dtype_family(spdf[c]), _dtype_family(oracle_pdf[c])
        if "all-null" in (fa, fb) or fa == fb:
            continue
        # date ↔ datetime is driver-safe: campaign_attribution shipped
        # Spark DateType vs DuckDB datetime64 and hashed green in r2
        # (both normalize to midnight ISO strings).
        if {fa, fb} == {"date", "datetime"}:
            continue
        out.append(
            f"{name}: column {c!r} dtype drift spark={fa} oracle={fb} "
            f"(raw {spdf[c].dtype} vs {oracle_pdf[c].dtype}) — the driver "
            f"hashes raw cells, so this fails its compare even if values "
            f"match; CAST the oracle column to the Spark type")
    return out


def canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(_norm_cell(row[c]) for c in cols))
    return sorted(out)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"{name}: columns differ spark={sorted(spdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}")
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"{name}: rowcount spark={len(spdf)} oracle={len(oracle_pdf)}")
    problems.extend(dtype_problems(spdf, oracle_pdf, name))
    a, b = canonical(spdf), canonical(oracle_pdf)
    if a != b:
        only_spark = [r for r in a if r not in set(b)][:3]
        only_oracle = [r for r in b if r not in set(a)][:3]
        problems.append(
            f"{name}: value mismatch; spark-only={only_spark} "
            f"oracle-only={only_oracle} (cols={sorted(spdf.columns)})")
    return problems


# ---------------------------------------------------------------------------
# Bounded (engine-side digest) compare — VERDICT r7 #4.
#
# The full `compare` materializes BOTH result sets through pandas and
# canonicalizes row-by-row in Python: for row-emitting queries at big
# fixtures the harness tax dwarfs the engines (coerce_event_props was
# 179 s of the r7 16x sweep for a trivial project/filter plan).  The
# digest form keeps verification order-insensitive and value-sensitive
# but computes it INSIDE each engine: every row folds to
#     md5(concat_ws(0x1f, canon(col) for col sorted by name))
# and the engines return only (row count, SUM of a 60-bit hash prefix)
# — two scalars — plus a bounded 200-row sample for the dtype-family
# check.  Python never sees the rows.
#
# Cross-engine canonicalization is the hard part; every rule below is
# pinned by tests/test_bounded_compare.py against hostile values:
#   * floats: MAGNITUDE-BANDED fixed-point via floor(x·scale + 0.5)
#     computed in DOUBLE (bit-identical IEEE ops in both engines — the
#     ROUNDING DECISION happens in arithmetic, not in string
#     formatting, so printf half-up-vs-half-even tie divergence can't
#     occur), then printf('%.0f', ·).  The bands (scale 1e9 below 9e6,
#     1e3 below 9e12, 1 below 9e15, prefixed A/B/C) keep the integral
#     double handed to printf under 2^53 ≈ 9.007e15 — the regime where
#     BOTH engines print exact digits; above it Java %f pads
#     shortest-repr with zeros while C prints the exact binary
#     expansion (a 3e10 money sum at 9 decimals is 3e19: caught live
#     on customer_segmentation at the 4x fixture).  Band granularity
#     tracks the double's own ulp, and any float column whose max |x|
#     ≥ 9e15 aborts to the full compare instead of guessing (the
#     digest query itself measures this, same scan).
#   * NULL → '∅' and NaN → '∅' (mirrors _norm_cell), ±inf explicit.
#   * timestamps via unix_micros/epoch_us (integer microseconds —
#     engines disagree on trailing-zero trimming of cast-to-string).
#   * int/bool/date/string: plain casts (verified identical).
# Arrays/binary/decimal/struct columns raise DigestUnsupported and the
# caller falls back to the full compare.
# ---------------------------------------------------------------------------

DIGEST_SEP = "\x1f"
DIGEST_FLOAT_CAP = 9e15


class DigestUnsupported(ValueError):
    """Column type the cross-engine digest cannot canonicalize."""


def _ffloor(y: str) -> str:
    """IEEE floor of a double expression, staying in DOUBLE (Spark's
    floor() returns BIGINT and overflows past 2^63; fmod is exact in
    both engines, so floor = y - y%1, minus 1 for negative non-ints)."""
    return (f"(({y}) - (({y}) % 1.0) - (CASE WHEN ({y}) < 0 AND "
            f"(({y}) % 1.0) <> 0.0 THEN 1.0 ELSE 0.0 END))")


def _canon_expr(col: str, family: str, engine: str) -> str:
    """Canonical-string SQL for one column; `engine` is 'spark'|'duck'."""
    q = f"`{col}`" if engine == "spark" else f'"{col}"'
    str_t = "STRING" if engine == "spark" else "VARCHAR"
    if family == "string":
        return f"coalesce({q}, '∅')"
    if family == "int":
        return f"coalesce(CAST({q} AS {str_t}), '∅')"
    if family == "bool":
        return (f"CASE WHEN {q} IS NULL THEN '∅' "
                f"ELSE CAST(CAST({q} AS INT) AS {str_t}) END")
    if family == "datetime":
        # one canon for BOTH date and timestamp columns (the driver
        # tolerates date↔datetime drift — campaign_attribution shipped
        # that way and hashed green — so the digest must too): render
        # as midnight-padded 6-digit-micros local-naive strings, which
        # the engines format identically (pinned in
        # test_bounded_compare)
        fmt = (f"date_format(CAST({q} AS TIMESTAMP), "
               f"'yyyy-MM-dd HH:mm:ss.SSSSSS')" if engine == "spark"
               else f"strftime(CAST({q} AS TIMESTAMP), "
                    f"'%Y-%m-%d %H:%M:%S.%f')")
        return f"CASE WHEN {q} IS NULL THEN '∅' ELSE {fmt} END"
    if family == "float":
        # Piecewise fixed-point, banded by magnitude so the integral
        # double handed to printf NEVER exceeds 2^53 ≈ 9.007e15 — the
        # regime where both engines print exact digits.  Beyond it
        # Java %f pads shortest-repr digits with zeros while C prints
        # the exact binary expansion (a 3e10 money sum at 9 decimals
        # is 3e19: diverges — caught live on customer_segmentation at
        # the 4x fixture).  Band prefixes prevent cross-band
        # collisions.  Per-band granularity (the real tolerance of the
        # bounded compare, NOT ulp-exact everywhere): 1e-9 below 9e6,
        # 1e-6 for 9e6–9e9, 1e-3 for 9e9–9e12, 1.0 for 9e12–9e15 —
        # each chosen so the integral double handed to printf stays
        # under 2^53 (9e9·1e6 = 9e15 < 2^53).  The band predicate is
        # an IEEE comparison on the same double in both engines —
        # identical.
        x = f"CAST({q} AS DOUBLE)"
        printf = "format_string" if engine == "spark" else "printf"
        nano = _ffloor(f"({x} * 1e9 + 0.5)")
        micro = _ffloor(f"({x} * 1e6 + 0.5)")
        milli = _ffloor(f"({x} * 1e3 + 0.5)")
        unit = _ffloor(f"({x} + 0.5)")
        return (f"CASE WHEN {q} IS NULL OR isnan({x}) THEN '∅' "
                f"WHEN {x} = CAST('Infinity' AS DOUBLE) THEN 'inf' "
                f"WHEN {x} = CAST('-Infinity' AS DOUBLE) THEN '-inf' "
                f"WHEN abs({x}) < 9e6 THEN 'A' || {printf}('%.0f', {nano}) "
                f"WHEN abs({x}) < 9e9 THEN 'B' || {printf}('%.0f', {micro}) "
                f"WHEN abs({x}) < 9e12 THEN 'C' || {printf}('%.0f', {milli}) "
                f"WHEN abs({x}) < 9e15 THEN 'D' || {printf}('%.0f', {unit}) "
                f"ELSE 'E' END")
    raise DigestUnsupported(f"column {col!r}: family {family!r}")


_SPARK_FAMILY = {"string": "string", "int": "int", "bigint": "int",
                 "smallint": "int", "tinyint": "int", "boolean": "bool",
                 "date": "datetime", "timestamp": "datetime",
                 "double": "float", "float": "float"}


def _duck_family(duck_type: str) -> str:
    t = duck_type.upper()
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "string"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return "datetime"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    return f"unsupported:{duck_type}"


def digest_compare(spark_df, oracle_sql: str, sf_dir: str,
                   name: str) -> list[str]:
    """Bounded compare: column names + dtype families (200-row sample)
    + row count + order-insensitive 60-bit hash sum, all computed
    engine-side.  Raises DigestUnsupported for non-scalar columns or
    float magnitudes past printf parity — callers fall back to
    `compare`.  Verdict-compatible with `compare` by construction:
    same columns, same row multiset ⇒ same digest; any count or value
    difference (beyond the shared per-magnitude-band float
    granularity — 1e-9 below 9e6, 1e-6 to 9e9, 1e-3 to 9e12, 1.0 to
    9e15; see _canon_expr) ⇒ digest
    mismatch."""
    problems: list[str] = []
    cols = sorted(spark_df.columns)

    con = _connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir.rstrip('/')}/{t}.parquet'")
    # one evaluation of the oracle; digest + sample read from the temp
    con.execute(f"CREATE TEMP TABLE __oracle AS {oracle_sql}")
    duck_types = {r[0]: r[1] for r in
                  con.execute("DESCRIBE __oracle").fetchall()}
    if cols != sorted(duck_types):
        return [f"{name}: columns differ spark={cols} "
                f"oracle={sorted(duck_types)}"]

    spark_types = dict(spark_df.dtypes)
    s_fams = {c: _SPARK_FAMILY.get(spark_types[c],
                                   f"unsupported:{spark_types[c]}")
              for c in cols}
    d_fams = {c: _duck_family(duck_types[c]) for c in cols}

    # a column neither engine can canonicalize (arrays, structs,
    # binary on both sides) is a FALLBACK — the full compare handles
    # those types; raise before the drift check so e.g.
    # array<float> vs FLOAT[] doesn't read as a type mismatch
    unsup_both = [c for c in cols
                  if s_fams[c].startswith("unsupported:")
                  and d_fams[c].startswith("unsupported:")]
    if unsup_both:
        raise DigestUnsupported(
            f"columns not canonicalizable engine-side: "
            f"{[(c, spark_types[c]) for c in unsup_both]}")

    # cross-engine family drift (e.g. oracle DECIMAL/HUGEINT where
    # Spark emits double/bigint): the driver hashes raw cells, so this
    # is a REPORTED failure, not a fallback — return the legible
    # sample-based findings instead of a digest mismatch
    drift = [c for c in cols if s_fams[c] != d_fams[c]]
    if drift:
        problems += dtype_problems(
            spark_df.limit(200).toPandas(),
            con.execute("SELECT * FROM __oracle LIMIT 200").fetchdf(),
            name)
        problems += [
            f"{name}: column {c!r} family drift spark={s_fams[c]} "
            f"oracle={d_fams[c]}" for c in drift
            if not any(f"column {c!r}" in p for p in problems)]
        return problems

    unsup = [c for c in cols if s_fams[c].startswith("unsupported:")]
    if unsup:
        raise DigestUnsupported(
            f"columns not canonicalizable engine-side: "
            f"{[(c, spark_types[c]) for c in unsup]}")

    # NO sample-based dtype check once the DECLARED families match:
    # the declared types (spark_df.dtypes / DESCRIBE) are complete and
    # engine-authoritative, while pandas samples false-positive — a
    # nullable BIGINT column converts to float64 exactly when the
    # 200-row sample happens to contain a NULL, and the two engines'
    # LIMIT samples pick different rows (caught live on
    # purchase_click_asof at the 4x fixture: declared bigint==BIGINT,
    # spark sample nulled → float64, oracle sample not → int64).

    float_cols = [c for c in cols if s_fams[c] == "float"]

    def digest_sql(engine: str, fams: dict, source: str) -> str:
        canon = ", ".join(_canon_expr(c, fams[c], engine) for c in cols)
        def cap_expr(c: str, i: int) -> str:
            # NaN/±inf canonicalize fine ('∅'/'inf') and must not trip
            # the magnitude guard (NaN also poisons max: NaN >= 1e15
            # compares False, silently DISABLING the guard — exclude
            # it in SQL, pinned by test_digest_refuses_big_floats)
            x = (f"CAST(`{c}` AS DOUBLE)" if engine == "spark"
                 else f'CAST("{c}" AS DOUBLE)')
            return (f"max(CASE WHEN isnan({x}) "
                    f"OR {x} = CAST('Infinity' AS DOUBLE) "
                    f"OR {x} = CAST('-Infinity' AS DOUBLE) THEN NULL "
                    f"ELSE abs({x}) END) AS __cap_{i}")

        if engine == "spark":
            h = (f"CAST(conv(substring(md5(concat_ws('{DIGEST_SEP}', "
                 f"{canon})), 1, 15), 16, 10) AS DECIMAL(38,0))")
        else:
            h = (f"('0x' || substring(md5(concat_ws('{DIGEST_SEP}', "
                 f"{canon})), 1, 15))::BIGINT")
        caps = ", ".join(cap_expr(c, i) for i, c in enumerate(float_cols))
        caps = (", " + caps) if caps else ""
        return (f"SELECT count(*) AS __n, sum({h}) AS __digest{caps} "
                f"FROM {source}")

    # Spark: register the df as a temp view scoped to this call
    view = f"__digest_src_{abs(hash(name)) % 10**8}"
    spark_df.createOrReplaceTempView(view)
    try:
        s_row = spark_df.sparkSession.sql(
            digest_sql("spark", s_fams, view)).collect()[0]
    finally:
        spark_df.sparkSession.catalog.dropTempView(view)
    d_row = con.execute(
        digest_sql("duck", d_fams, "__oracle")).fetchone()

    # float-magnitude guard: the top band ends at 9e15 (≈2^53); above
    # it the canon collapses to a constant, so force the full compare
    for i, c in enumerate(float_cols):
        for side, row in (("spark", s_row), ("oracle", d_row)):
            cap = row[2 + i]
            if cap is not None and float(cap) >= DIGEST_FLOAT_CAP:
                raise DigestUnsupported(
                    f"column {c!r} |max| = {cap!r} ≥ 9e15 on the "
                    f"{side} side — beyond cross-engine printf parity")

    n_s, n_d = int(s_row[0]), int(d_row[0])
    if n_s != n_d:
        problems.append(f"{name}: row count spark={n_s} oracle={n_d}")
        return problems
    dig_s = int(s_row[1]) if s_row[1] is not None else 0
    dig_d = int(d_row[1]) if d_row[1] is not None else 0
    if dig_s != dig_d:
        problems.append(
            f"{name}: value digest differs over {n_s} rows "
            f"(spark={dig_s} oracle={dig_d}) — order-insensitive "
            f"multiset of canonicalized rows is not equal")
    return problems
