"""Text-analysis operators over the documents table.

Everything is built-in Catalyst expressions (regexp_*, split, filter,
md5) — zero Python UDFs, so the hot path stays in whole-stage codegen
and the DuckDB oracle can reproduce it exactly.

- language-ID: stopword-profile n-gram heuristic (argmax of per-language
  stopword hit ratios).  NOTE: the driver's fixture `lang` labels are
  synthetic (all texts are English-ish word salad), so accuracy against
  the label column is *not* the correctness criterion — the computation
  is.
- quality scoring: length / punctuation / stopword / repetition ratios
  blended into a [0,1] score, the standard pre-training heuristics.
- token counting: whitespace tokens + a BPE-ish regex segmentation
  (letters runs | single digits | punctuation marks).
- fingerprinting: content md5 + min-hash-of-character-8-grams (a
  winnowing-style rolling-window fingerprint).
"""

from __future__ import annotations

from ..functions.rounding import pround
from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "les", "et", "des", "un"),
    "zh": ("的", "是", "在", "了", "我"),
}

_WORDS = lambda c: F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")  # noqa: E731


def word_count(text: Column) -> Column:
    return F.size(_WORDS(text))


def stopword_hits(text: Column, lang: str) -> Column:
    """How many stopword units the text contains for ``lang``.

    Latin languages count whole tokens from the word tokenizer; 'zh'
    counts stopword CHARACTERS on the raw text, because CJK is
    unsegmented and the ``[^a-z0-9]`` tokenizer deletes every CJK
    character — a token-based zh count would be structurally zero
    (dead code masquerading as support)."""
    if lang == "zh":
        cls = "[" + "".join(STOPWORDS["zh"]) + "]"
        return F.length(text) - F.length(F.regexp_replace(text, cls, ""))
    words = _WORDS(text)
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words, lambda x: F.array_contains(arr, x)))


def language_id(text: Column) -> Column:
    """Argmax stopword-hits language; 'und' when nothing matches.

    Ties break to the alphabetically-first language — a CASE chain
    (not a loop state machine) so the DuckDB oracle can mirror the
    exact expression.  The guard is on max-hits only (not word count):
    pure-CJK text has zero Latin tokens but positive zh hits and must
    classify as 'zh', not 'und'.
    """
    hits = {lang: stopword_hits(text, lang) for lang in sorted(STOPWORDS)}
    m = F.greatest(*hits.values())
    chain = F.when(m <= 0, F.lit("und"))
    for lang in sorted(STOPWORDS):
        chain = chain.when(hits[lang] == m, F.lit(lang))
    return chain.otherwise(F.lit("und"))


def punct_ratio(text: Column) -> Column:
    # count of the six sentence-punctuation chars — one translate scan,
    # no regex (bit-equal to length(regexp_replace(text,'[^.!?,;:]','')),
    # which is what the DuckDB oracle twin still states)
    n_punct = F.length(text) - F.length(F.translate(text, ".!?,;:", ""))
    return pround(n_punct / F.greatest(F.length(text), F.lit(1)), 4)


def quality_score(text: Column) -> Column:
    """Blend of pre-training quality heuristics → [0,1], rounded.

    - length score: saturating word count / 100
    - lexical diversity: distinct words / words
    - punctuation sanity: 1 − min(1, punct_ratio·10)
    """
    words = _WORDS(text)
    n = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    diversity = n_distinct / F.greatest(n, F.lit(1))
    punct_sane = F.lit(1.0) - F.least(punct_ratio(text) * 10, F.lit(1.0))
    return pround((length_score + diversity + punct_sane) / 3.0, 4)


BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"

_ASCII_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
_JAVA_WS = " \t\n\x0b\x0c\r"  # Java regex \s (default, non-UNICODE flags)


def bpe_token_count(text: Column) -> Column:
    """``size(regexp_extract_all(text, BPE_ISH_PATTERN, 0))`` without
    materializing any match.

    The pattern's three alternatives partition every character of the
    input: ASCII letter runs count once per RUN, while digits and
    chars that are neither ASCII-alphanumeric nor Java ``\\s``
    whitespace count once per CHAR.  So the token count decomposes
    into one greedy-run ``regexp_count`` (one matcher find per letter
    run instead of one per token) plus ``translate``/``length``
    arithmetic (non-regex scans, no per-match substring allocation).
    Bit-equal to the extract-all form on every string —
    hypothesis-pinned — and ~1.5× cheaper on the 64× corpus, where the
    tokenizer is ~0.7 of the packing query's whole wall
    (evidence/PACKING_DECOMP.json).  Costs ~0.1 s MORE than
    extract-all at sf0.1, where fixed per-plan cost dominates and the
    extract-all's allocations are too few to matter — a deliberate
    scale-over-microbenchmark trade.  Counting the single-char classes
    with a second ``regexp_count('[^a-zA-Z\\s]')`` instead is 9×
    WORSE at 64× (~22 s vs ~2.4: one matcher find per punctuation/
    digit char), which is why the singles come from translate
    arithmetic.
    """
    # digits and "other" chars both count one token per CHAR, so they
    # merge into n_singles = chars that are neither ASCII letters nor
    # Java \s — two translate scans, the digit translate cancels:
    #   n_singles = L − n_ws − n_letters
    #             = len(sans_ws) + len(sans_letters) − L
    n = F.length(text)
    sans_letters = F.length(F.translate(text, _ASCII_LETTERS, ""))
    sans_ws = F.length(F.translate(text, _JAVA_WS, ""))
    n_letter_runs = F.regexp_count(text, F.lit(r"[a-zA-Z]+"))
    return n_letter_runs + sans_ws + sans_letters - n


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    bpe = bpe_token_count(t)
    return df.select(
        F.col(id_col),
        ws.cast("bigint").alias("ws_tokens"),
        bpe.cast("bigint").alias("bpe_ish_tokens"),
    )


def fingerprints(df: DataFrame, text_col: str, id_col: str,
                 gram: int = 8) -> DataFrame:
    """Content md5 + winnowing-style min-hash over char 8-grams.

    The min over a rolling window of hashed character n-grams is the
    core of winnowing fingerprints; taking the global min (window =
    whole doc) gives a compact single-value fingerprint that is stable
    under small edits elsewhere in the doc.
    """
    norm = F.lower(F.trim(F.col(text_col)))
    grams = F.expr(
        f"transform(sequence(1, greatest(length(t) - {gram - 1}, 1)), "
        f"i -> md5(substring(t, i, {gram})))"
    )
    return (df.select(F.col(id_col), norm.alias("t"))
              .select(
                  id_col,
                  F.md5(F.col("t")).alias("content_md5"),
                  F.array_min(grams).alias("winnow_fp"),
              ))


def quality_score_pandas_udf():
    """Arrow-vectorized pandas_udf twin of ``quality_score`` — the UDF
    registration surface (SURVEY.md §2.11).  The engine needs no UDFs
    for parity (everything above is codegen'd Catalyst); this exists to
    prove the extension point and is tested bit-equal to the built-in
    expression path on ASCII inputs.
    """
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    word_re = re.compile(r"[^a-z0-9]+")
    punct_re = re.compile(r"[^.!?,;:]")

    def _score(texts):
        import math

        def one(t):
            if t is None:
                # the Catalyst twin propagates NULL text to a NULL
                # score; coercing to '' would score 0.3333 and change
                # which rows survive a threshold filter
                return None
            words = [w for w in word_re.split(t.lower()) if w]
            n = len(words)
            punct = len(punct_re.sub("", t)) / max(len(t), 1)
            punct = math.floor(punct * 10000 + 0.5) / 10000
            length_score = min(n / 100.0, 1.0)
            diversity = len(set(words)) / max(n, 1)
            punct_sane = 1.0 - min(punct * 10, 1.0)
            v = (length_score + diversity + punct_sane) / 3.0
            return math.floor(v * 10000 + 0.5) / 10000

        return texts.map(one)

    # positional form: postponed annotations (module-level
    # `from __future__ import annotations`) break hint inference
    return pandas_udf(_score, "double")


def gopher_quality(df: DataFrame, text_col: str, id_col: str,
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0,
                   max_dup_trigram_frac: float = 0.30) -> DataFrame:
    """Gopher-style document quality rules (published pretraining
    filters: word-count bounds, mean word length band, repeated-trigram
    fraction) as one stateless Catalyst projection — per doc the rule
    inputs plus the final ``passes`` verdict.

    Everything is array expressions over the tokenized text (no UDF,
    no shuffle): dup_trigram_frac = 1 − |distinct trigrams|/|trigrams|,
    the standard repetition signal; short/long docs and outlier word
    lengths are the classic gibberish/boilerplate cuts.

    Consumer note: filtering directly on the returned columns lets the
    optimizer substitute the staged aliases into the pruned predicate
    (PushDownPredicate/CollapseProject have no cost guard once only
    ``passes`` survives column pruning), inlining the tokenization
    ``split`` ~24x into one expression — interpreted higher-order
    functions get no subexpression reuse, so the filter runs ~7x the
    projection cost (measured 22 s vs 3.5 s at sf0.1).  To *filter* on
    the verdict, use :func:`gopher_gate` instead — a single-expression
    predicate with the words array lambda-bound once, which is safe
    (and beneficial) to push all the way into the scan.  This frame is
    for when the per-rule diagnostics themselves are the output.
    """

    base = df.select(F.col(id_col), _WORDS(F.col(text_col)).alias("_w"))
    n_words = F.size(F.col("_w"))
    mean_wl = (F.aggregate("_w", F.lit(0).cast("long"),
                           lambda acc, x: acc + F.length(x)).cast("double")
               / F.when(n_words > 0, n_words))
    tg = F.when(n_words >= 3, F.expr(
        "transform(sequence(0, size(_w) - 3),"
        " i -> concat_ws(' ', _w[i], _w[i+1], _w[i+2]))"
    )).otherwise(F.expr("CAST(array() AS array<string>)"))
    staged = base.select(F.col(id_col), n_words.alias("_n"),
                         mean_wl.alias("_mwl"), tg.alias("_tg"))
    n_tg = F.size("_tg")
    dup_frac = F.when(
        n_tg > 0,
        F.lit(1.0) - F.size(F.array_distinct("_tg")).cast("double") / n_tg
    ).otherwise(F.lit(0.0))
    mean_r = pround(F.col("_mwl"), 4)
    dup_r = pround(dup_frac, 4)
    passes = ((F.col("_n") >= min_words) & (F.col("_n") <= max_words)
              & (mean_r >= min_mean_word_len) & (mean_r <= max_mean_word_len)
              & (dup_r <= max_dup_trigram_frac))
    return staged.select(
        F.col(id_col),
        F.col("_n").cast("long").alias("n_words"),
        mean_r.alias("mean_word_len"),
        dup_r.alias("dup_trigram_frac"),
        F.coalesce(passes, F.lit(False)).alias("passes"),
    )


def gopher_gate(text_col: str, min_words: int = 50, max_words: int = 100_000,
                min_mean_word_len: float = 3.0,
                max_mean_word_len: float = 10.0,
                max_dup_trigram_frac: float = 0.30) -> Column:
    """The :func:`gopher_quality` ``passes`` verdict as ONE boolean
    expression, built for use directly in ``df.filter(...)``.

    The trick: ``exists(array(<words>), w -> <rules>)`` binds the
    tokenized words array to the lambda variable ``w`` exactly once,
    so however Catalyst collapses / pushes the predicate, the
    ``split`` runs once per row (vs ~24x when the staged
    gopher_quality aliases are substituted into a pruned filter — the
    r2 funnel needed a persist() barrier against that; this needs
    none).  Deterministic, so it pushes through joins down to the
    scan — at 100 TB the gate runs inside the file scan with no extra
    join, shuffle, or pinned cache.

    Exactly replicates gopher_quality's semantics, including the
    4-digit deterministic rounding of the mean-word-length and
    dup-trigram fractions and NULL→False coalescing.
    """
    c = f"`{text_col}`"
    mean_r = ("floor(CAST(aggregate(w, CAST(0 AS BIGINT),"
              " (a, x) -> a + length(x)) AS DOUBLE)"
              " / nullif(size(w), 0) * 10000 + 0.5) / 10000")
    # size(tg) == size(w)-2 for size(w)>=3, so the trigram array is
    # materialized once (inside array_distinct) per row
    dup_r = ("CASE WHEN size(w) >= 3 THEN"
             " floor((1.0 - CAST(size(array_distinct("
             "   transform(sequence(0, size(w) - 3),"
             "     i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
             " )) AS DOUBLE) / (size(w) - 2)) * 10000 + 0.5) / 10000"
             " ELSE 0.0 END")
    return F.expr(f"""
      exists(
        array(filter(split(lower({c}), '[^a-z0-9]+'), x -> x <> '')),
        w -> coalesce(
               size(w) >= {min_words} AND size(w) <= {max_words}
               AND {mean_r} >= {min_mean_word_len}
               AND {mean_r} <= {max_mean_word_len}
               AND {dup_r} <= {max_dup_trigram_frac}, false)
      )""")


# ------------------------------------------------------------------ PII

# Java-regex ∩ RE2 subset (character classes, bounded repeats, \b) so
# Spark and the DuckDB oracle compile the IDENTICAL pattern strings.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,2}-\d{3}-\d{4}",
}


def pii_scrub(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Regex PII detection + masking (the pre-training scrub pass):
    per document, the match count for each PII class and the md5 of
    the text after replacing every match with ``<CLASS>``.

    The md5 pins the exact redacted string (span boundaries included)
    cross-engine, which is a far stronger check than counts alone.
    Redaction is sequential in PII_PATTERNS order (email → ipv4 →
    phone) and each class is COUNTED on the text as it stands at that
    step — classes can nest (an IPv4 inside an email's domain,
    ``a@1.2.3.4.xy``), and counting each class on the original text
    would report matches the earlier redaction already consumed,
    leaving counts irreconcilable with the mask.  The mask tokens
    themselves can never create new matches (no ``@``, digits, or
    ``+``).  NULL text counts as empty (0 matches, md5 of '').

    Scale: a stateless projection of codegen'd regexp expressions —
    runs inside the scan at 100 TB, no shuffle, no UDF; counts
    aggregate map-side if rolled up downstream.
    """
    red = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for k, p in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(red, F.lit(p), 0)).cast("bigint")
            .alias(f"n_{k}"))
        red = F.regexp_replace(red, p, f"<{k.upper()}>")
    return df.select(F.col(id_col), *counts, F.md5(red).alias("redacted_md5"))
