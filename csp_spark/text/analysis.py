"""Text analysis for large-scale training-data pipelines.

Not part of the reference (csp has no string library — SURVEY.md
§2.10); these are the document-pipeline operators a 100 TB corpus
needs, built entirely from JVM-side expressions (no Python UDFs) so
they run inside whole-stage codegen over a parquet scan.

Every function is a Column-in/Column-out combinator; `annotate`
applies the standard set to a documents table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small multilingual stopword profiles for the n-gram/stopword language
# heuristic; deliberately tiny and deterministic (real pipelines plug in
# fastText & friends — out of scope for this container)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_word_len(text: Column) -> Column:
    t = tokens(text)
    return F.aggregate(
        t, F.lit(0.0), lambda acc, w: acc + F.length(w)
    ) / F.size(t)


def _ratio(num: Column, den: Column) -> Column:
    # when-guard rather than bare division: ANSI sessions raise
    # DIVIDE_BY_ZERO on empty text; non-ANSI would yield null anyway.
    return F.when(den > 0, num / den)


def punct_ratio(text: Column) -> Column:
    return _ratio(F.length(F.regexp_replace(text, r"[^.,;:!?]", "")), F.length(text))


def digit_ratio(text: Column) -> Column:
    return _ratio(F.length(F.regexp_replace(text, r"[^0-9]", "")), F.length(text))


def upper_ratio(text: Column) -> Column:
    return _ratio(F.length(F.regexp_replace(text, r"[^A-Z]", "")), F.length(text))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    t = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(t, lambda w: F.array_contains(sw, w))) / F.size(t)


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length sweet-spot, low punctuation
    noise, low digit noise, reasonable word lengths — the classic cheap
    pre-filter before expensive model scoring."""
    n = token_count(text)
    len_score = F.least(n / F.lit(64.0), F.lit(1.0))
    wl = avg_word_len(text)
    wl_score = F.when((wl >= 3) & (wl <= 10), 1.0).otherwise(0.5)
    noise = punct_ratio(text) + digit_ratio(text)
    noise_score = F.greatest(F.lit(0.0), F.lit(1.0) - noise * 4)
    return F.round((len_score + wl_score + noise_score) / 3, 6)


def lang_guess(text: Column) -> Column:
    """Deterministic stopword-profile language ID over the profiles in
    STOPWORDS; ties break by language code order. A scale pipeline
    swaps in a model via pandas_udf — the plumbing stays identical."""
    t = tokens(text)
    scores = []
    for code, words in sorted(STOPWORDS.items()):
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(t, lambda w: F.array_contains(sw, w))).alias("hits"),
                F.lit({"en": 3, "de": 2, "fr": 1, "es": 0}[code]).alias("pri"),
                F.lit(code).alias("code"),
            )
        )
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return best["code"]


def fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: xxhash64 over the
    token sequence (shift-invariant collisions avoided by hashing the
    joined normalized text). Used for cheap near-exact dedup after
    whitespace/case normalization."""
    return F.xxhash64(F.array_join(tokens(text), " "))


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    hash_style: str = "xx64",
    distinct: bool = True,
) -> DataFrame:
    """Winnowing-style document fingerprints (min-sampling the rolling
    k-gram hash sequence — Schleimer/Wilkerson/Aiken, SIGMOD'03): a
    shingle hash is SELECTED when it is the minimum of the w-window
    ending at its position; the distinct selected hashes are the doc's
    fingerprint set (density ~1/w of all shingles, position-robust: a
    local edit perturbs only nearby window minima).

    Scale shape: explode shingle positions → hash → one shuffle by doc
    id for the ordered window-min → filter (+ optional distinct). Per-doc
    work is linear; no cross-doc joins.

    hash_style: "xx64" (default) keeps the shuffled/sorted rows at 8-byte
    longs — at 100M+ shingle rows the 32-char md5 hex strings quadruple
    shuffle volume and make every sort comparison a string compare
    (measured 15.5x vs 10x data growth; xx64 restores ~linear). "md5"
    exists so external engines (DuckDB oracle) reproduce the selection
    bit-for-bit.

    distinct=False skips the final exchange when the consumer aggregates
    anyway (e.g. collect_set per doc) — dedup then happens inside that
    aggregate's map-side partials instead of a dedicated shuffle.

    Returns (id, fp) rows — one per selected fingerprint hash.
    """
    from pyspark.sql import Window

    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    norm = docs.select(
        F.col(id_col).alias("id"),
        F.array_join(tokens(F.col(text_col)), " ").alias("n"),
    )
    pos = norm.select(
        "id", "n",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("n") - (k - 1), F.lit(1)))
        ).alias("i"),
    )
    shingle = F.col("n").substr(F.col("i"), F.lit(k))
    hfn = F.md5(shingle) if hash_style == "md5" else F.xxhash64(shingle)
    hashed = pos.select("id", "i", hfn.alias("h"))
    win = Window.partitionBy("id").orderBy("i").rowsBetween(-(w - 1), 0)
    out = (
        hashed.withColumn("__m", F.min("h").over(win))
        .filter(F.col("h") == F.col("__m"))
        .select("id", F.col("h").alias("fp"))
    )
    return out.distinct() if distinct else out


def annotate(
    docs: DataFrame, text_col: str = "text", lang: str = "en"
) -> DataFrame:
    """Attach the standard text-analysis columns to a documents table."""
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count(t).alias("n_tokens"),
        char_count(t).alias("n_chars_computed"),
        F.round(avg_word_len(t), 6).alias("avg_word_len"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t, lang), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_guess(t).alias("lang_guess"),
        fingerprint(t).alias("fingerprint"),
    )
