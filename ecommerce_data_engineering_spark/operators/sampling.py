"""Deterministic sampling / split assignment for training-data curation.

Random sampling (``df.sample``) is non-reproducible across runs and
engines; training-data pipelines need the opposite: membership decided
by a pure function of the row's stable id, so re-runs, backfills, and
two engines agree row-for-row on what is in the sample.  The standard
trick: hash the id, compare against a threshold that encodes the
fraction — here the first 8 hex chars of the portable md5
(functions/hashing.py) compared lexicographically against
``hex(fraction * 2^32)``.  Both Spark and DuckDB produce identical md5
hex, so every operator below is oracle-checkable.

Scale: a sample/split is a stateless per-row filter/projection — no
shuffle, no state, pushes down past column pruning; at 100 TB it runs
at scan speed and composes with partition pruning untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import SEED_SEP, portable_hash_hex

_HEX_WIDTH = 8          # 32 bits of digest: 1/2^32 fraction resolution


def threshold_hex(fraction: float) -> str | None:
    """``None`` means "keep everything" (fraction >= 1)."""
    if fraction >= 1.0:
        return None
    n = max(int(fraction * (1 << 32)), 0)
    return format(n, f"0{_HEX_WIDTH}x")


def hash_bucket_hex(id_col: Column | str, seed: int = 0) -> Column:
    """First 8 hex chars of the seeded portable digest of the id."""
    return F.substring(portable_hash_hex(id_col, seed=seed), 1, _HEX_WIDTH)


def sample_predicate(id_col: Column | str, fraction: float,
                     seed: int = 0) -> Column:
    """True for rows in the deterministic ``fraction`` sample."""
    thr = threshold_hex(fraction)
    if thr is None:
        return F.lit(True)
    return hash_bucket_hex(id_col, seed) < F.lit(thr)


def deterministic_sample(df: DataFrame, id_col: str, fraction: float,
                         seed: int = 0) -> DataFrame:
    return df.filter(sample_predicate(id_col, fraction, seed))


def split_column(id_col: Column | str, splits: dict[str, float],
                 seed: int = 0) -> Column:
    """One split label per row from cumulative hash thresholds.

    ``splits`` maps label → fraction (must sum to ~1; the last split
    absorbs rounding).  Iteration order of the dict defines the
    threshold order, so pass it in canonical (train/val/test) order.
    """
    labels = list(splits)
    expr: Column | None = None
    cum = 0.0
    bucket = None
    for label in labels[:-1]:
        cum += splits[label]
        thr = threshold_hex(cum)
        if thr is None:
            # a non-final cumulative fraction >= 1 starves every later
            # label; Spark would build `bucket < NULL` (never true)
            # while the SQL twin would compare against the string
            # 'None' — a silent cross-engine divergence
            raise ValueError(
                f"splits reach cumulative fraction {cum} at non-final "
                f"label {label!r}; fractions before the last label must "
                f"sum to < 1")
        if bucket is None:
            bucket = hash_bucket_hex(id_col, seed)
        cond = bucket < F.lit(thr)
        expr = F.when(cond, F.lit(label)) if expr is None else \
            expr.when(cond, F.lit(label))
    if expr is None:                      # single split
        return F.lit(labels[-1])
    return expr.otherwise(F.lit(labels[-1]))


def assign_splits(df: DataFrame, id_col: str, splits: dict[str, float],
                  seed: int = 0, out_col: str = "split") -> DataFrame:
    return df.withColumn(out_col, split_column(id_col, splits, seed))


def stratified_threshold(stratum_col: Column | str,
                         fractions: dict[str, float],
                         default: float = 1.0) -> Column:
    """Per-row hex threshold string from the stratum's target fraction
    (chained CASE — stays a codegen'd expression)."""
    c = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
    expr: Column | None = None
    for stratum, frac in fractions.items():
        thr = threshold_hex(frac) or "g"      # 'g' > any hex char: keep all
        cond = c == F.lit(stratum)
        expr = F.when(cond, F.lit(thr)) if expr is None else \
            expr.when(cond, F.lit(thr))
    dflt = F.lit(threshold_hex(default) or "g")
    return dflt if expr is None else expr.otherwise(dflt)


def stratified_predicate(id_col: Column | str, stratum_col: Column | str,
                         fractions: dict[str, float], default: float = 1.0,
                         seed: int = 0) -> Column:
    """Weighted per-stratum sampling (source mixing) in one stateless
    pass — no per-stratum scans, no shuffle."""
    return hash_bucket_hex(id_col, seed) < \
        stratified_threshold(stratum_col, fractions, default)


# --- oracle SQL twins (same thresholds, same digest) -------------------

def sql_bucket(id_expr: str, seed: int = 0) -> str:
    """DuckDB expression equal to :func:`hash_bucket_hex`."""
    return (f"substring(md5('{seed}{SEED_SEP}' || "
            f"CAST({id_expr} AS VARCHAR)), 1, {_HEX_WIDTH})")


def _sql_str(v: str) -> str:
    """Single-quoted SQL string literal with embedded quotes doubled —
    stratum/label values are caller data and must not be able to break
    (or redirect) the oracle SQL the twins emit."""
    return "'" + str(v).replace("'", "''") + "'"


def sql_sample_predicate(id_expr: str, fraction: float, seed: int = 0) -> str:
    thr = threshold_hex(fraction)
    if thr is None:
        return "TRUE"
    return f"{sql_bucket(id_expr, seed)} < '{thr}'"


def sql_stratified_predicate(id_expr: str, stratum_expr: str,
                             fractions: dict[str, float],
                             default: float = 1.0, seed: int = 0) -> str:
    whens = " ".join(
        f"WHEN {stratum_expr} = {_sql_str(s)} THEN '{threshold_hex(f) or 'g'}'"
        for s, f in fractions.items())
    case = (f"CASE {whens} ELSE '{threshold_hex(default) or 'g'}' END"
            if whens else f"'{threshold_hex(default) or 'g'}'")
    return f"{sql_bucket(id_expr, seed)} < {case}"


def sql_split_case(id_expr: str, splits: dict[str, float],
                   seed: int = 0) -> str:
    labels = list(splits)
    if len(labels) == 1:
        return _sql_str(labels[-1])
    parts, cum = [], 0.0
    for label in labels[:-1]:
        cum += splits[label]
        thr = threshold_hex(cum)
        if thr is None:                  # same guard as split_column
            raise ValueError(
                f"splits reach cumulative fraction {cum} at non-final "
                f"label {label!r}; fractions before the last label must "
                f"sum to < 1")
        parts.append(f"WHEN {sql_bucket(id_expr, seed)} < "
                     f"'{thr}' THEN {_sql_str(label)}")
    return f"CASE {' '.join(parts)} ELSE {_sql_str(labels[-1])} END"


def epoch_factor_columns(id_col: Column | str, stratum_col: Column | str,
                         factors: dict[str, float], default: float = 1.0,
                         seed: int = 0) -> Column:
    """Per-row integer copy count implementing fractional epoch
    upsampling (the LLaMA/Pile mixture trick: a source with factor 2.5
    ships every document twice, plus a deterministic half of them a
    third time).

    copies = floor(factor) + (1 if hash(id) < frac(factor) else 0) —
    membership in the fractional extra copy is the same md5-threshold
    predicate as sampling, so re-runs and the DuckDB oracle agree
    row-for-row, and a document's copy count never changes as the
    corpus grows.
    """
    c = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
    base_expr: Column | None = None
    frac_expr: Column | None = None
    for stratum, f in factors.items():
        base, thr = _epoch_base_and_threshold(f)
        cond = c == F.lit(stratum)
        base_expr = (F.when(cond, F.lit(base)) if base_expr is None
                     else base_expr.when(cond, F.lit(base)))
        frac_expr = (F.when(cond, F.lit(thr)) if frac_expr is None
                     else frac_expr.when(cond, F.lit(thr)))
    dbase, dthr = _epoch_base_and_threshold(default)
    base_expr = F.lit(dbase) if base_expr is None else base_expr.otherwise(F.lit(dbase))
    frac_expr = F.lit(dthr) if frac_expr is None else frac_expr.otherwise(F.lit(dthr))
    # NULL id: the hash comparison is NULL — coalesce to 0 extra copies
    # so the row keeps its base count, matching the SQL twin's
    # CASE WHEN NULL THEN 1 ELSE 0 END (which yields 0); without this
    # Spark's base + NULL = NULL and epoch_upsample silently drops the
    # row while DuckDB keeps it — a cross-engine divergence
    extra = F.coalesce(
        (hash_bucket_hex(id_col, seed) < frac_expr).cast("int"), F.lit(0))
    return (base_expr + extra).cast("int")


def _epoch_base_and_threshold(factor: float) -> tuple[int, str]:
    """(integer copies, fractional-extra hex threshold) for one epoch
    factor.  A fractional part that ROUNDS to 1.0 (e.g. 2.9999999996)
    must not reach threshold_hex(1.0) -> None — Spark would compare
    against NULL (copies become NULL, rows silently dropped) while the
    SQL twin would interpolate the string 'None' (≈62% of hashes
    compare below it) — so it maps to the always-true sentinel 'g'
    ('g' > every hex char), i.e. base+1 copies for every row, which is
    the correct limit of factor -> base+1."""
    base, frac = int(factor), round(factor - int(factor), 9)
    if frac <= 0:
        return base, "0" * _HEX_WIDTH
    return base, threshold_hex(frac) or "g"


def epoch_upsample(df: DataFrame, id_col: str, stratum_col: str,
                   factors: dict[str, float], default: float = 1.0,
                   seed: int = 0, copy_col: str = "epoch_copy") -> DataFrame:
    """Materialize the upsampled corpus: one output row per copy, with
    ``copy_col`` numbering 1..n_copies.  A stateless explode whose
    fan-out is the (small) epoch factor — scan-shaped, no shuffle; at
    100 TB the duplication happens inside the scan projection and
    flows straight to the sink/packer.

    Rows whose copy count is 0 (factor < 1 and hash outside the
    fraction) are dropped — fractional factors below 1 double as
    deterministic downsampling.
    """
    n = epoch_factor_columns(id_col, stratum_col, factors, default, seed)
    return (df.withColumn("_n_copies", n)
              .filter(F.col("_n_copies") > 0)
              .withColumn(copy_col,
                          F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
              .drop("_n_copies"))


def sql_epoch_factor(id_expr: str, stratum_expr: str,
                     factors: dict[str, float], default: float = 1.0,
                     seed: int = 0) -> str:
    """DuckDB twin of :func:`epoch_factor_columns`."""
    one = _epoch_base_and_threshold

    base_whens = " ".join(
        f"WHEN {stratum_expr} = {_sql_str(s)} THEN {one(f)[0]}"
        for s, f in factors.items())
    frac_whens = " ".join(
        f"WHEN {stratum_expr} = {_sql_str(s)} THEN '{one(f)[1]}'"
        for s, f in factors.items())
    dbase, dthr = one(default)
    base = (f"CASE {base_whens} ELSE {dbase} END" if base_whens else f"{dbase}")
    frac = (f"CASE {frac_whens} ELSE '{dthr}' END" if frac_whens else f"'{dthr}'")
    return (f"({base} + CASE WHEN {sql_bucket(id_expr, seed)} < {frac} "
            f"THEN 1 ELSE 0 END)")
