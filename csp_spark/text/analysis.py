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


def spread(df: DataFrame) -> DataFrame:
    """Round-robin the input across the default parallelism ONLY when
    the scan arrives under-parallel (small corpus in one parquet file
    = one partition serializing the whole per-doc scan onto one core).
    At 100 TB the file count already provides the parallelism and an
    unconditional repartition would be a full-corpus shuffle — this is
    a no-op there (a partition-count probe via the RDD plan, no data
    job; the DataFrame→RDD conversion does cost a plan translation).
    Under Spark Connect neither sparkContext nor .rdd exists — the
    probe degrades to a no-op (trust the scan's parallelism)."""
    try:
        par = df.sparkSession.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:  # Spark Connect: no sparkContext / RDD access
        return df
    if n < par:
        return df.repartition(par)
    return df


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_word_len(text: Column) -> Column:
    t = tokens(text)
    # total token chars via one codegen concat+length instead of an
    # interpreted per-word aggregate fold (higher-order lambdas never
    # enter whole-stage codegen). Bit-identical: the fold summed int
    # lengths into a 0.0-seeded double — exact for any corpus-sized
    # count — and Spark's / promotes both forms to double.
    return F.length(F.concat_ws("", t)) / F.size(t)


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

    Scale shape: ZERO shuffle — the rolling hash sequence AND the
    window-min selection are per-doc array expressions (higher-order
    functions), so the whole operator is scan → per-row work →
    explode of the (small, ~L/w element) selected array. The earlier
    explode-then-window plan carried the full normalized text on every
    shingle row (O(len²) bytes per doc) and shuffled every shingle by
    doc id for the ordered window-min; at 10x corpus that spilled and
    scaled 13.4x. The window-min itself is a LOG-STEP DOUBLING of
    whole-array least() zips (O(len·log w) lambda evaluations, NULL
    padding reproduces the truncated leading windows), not a per-
    element slice + array_min (O(len·w) interpreted evals, one array
    allocation per element — higher-order lambdas never enter
    whole-stage codegen, and that form measured ~6x slower at 10x
    corpus once the session's eval sites go megamorphic). Per-row
    memory stays O(len).

    hash_style: "xx64" (default) keeps the per-doc hash array at
    8-byte longs; "md5" exists so external engines (DuckDB oracle)
    reproduce the selection bit-for-bit (string min ordering matches).

    distinct=True dedups INSIDE the array (array_distinct — per-doc
    sets are global sets since id is part of the key), so there is no
    dedicated distinct exchange in either mode; distinct=False keeps
    one row per selected position (multiplicity preserved) for
    consumers that aggregate anyway (e.g. collect_set per doc).

    Returns (id, fp) rows — one per selected fingerprint hash.
    """
    docs = spread(docs)
    norm = docs.select(
        F.col(id_col).alias("id"),
        F.array_join(tokens(F.col(text_col)), " ").alias("n"),
    )

    def hfn(c):
        return F.md5(c) if hash_style == "md5" else F.xxhash64(c)

    seq = F.sequence(F.lit(1), F.greatest(F.length("n") - (k - 1), F.lit(1)))
    # Materialize the hash array as a bound column BEFORE the selection
    # pass: the selection lambda slices the array per element, and an
    # attribute reference makes that an O(w) read — inlining the
    # transform expression there would re-evaluate the whole rolling
    # hash per element (O(len²) compute).
    hashed = norm.select(
        "id",
        F.transform(seq, lambda i: hfn(F.col("n").substr(i, F.lit(k)))).alias("hs"),
    )
    # Select h[i] when it equals the min of the w-window ending at i
    # (trailing window truncated at the doc start, matching the
    # rowsBetween(-(w-1), 0) frame of the window-function form).
    # Sliding min by doubling: each pass zips the running-min array
    # with itself shifted ``step`` right, so the covered span grows
    # 1 → 2 → 4 → ... → w in ceil(log2 w) whole-array passes. The
    # shift pads with NULLs, which least() skips — exactly the
    # truncated windows at the doc start. Each pass is PROJECTED into
    # a bound column before the next consumes it: a pass references
    # its input three times (zip_with arg + the shift's slice/size),
    # so inlining would re-evaluate the previous pass ~3x per level —
    # O(len·3^log2 w) instead of O(len·log w). CollapseProject keeps
    # the projection (multi-referenced non-cheap alias), the same
    # device as the ``hs`` materialization above.
    elem_t = "string" if hash_style == "md5" else "bigint"

    def _shift(arr, d):
        return F.concat(
            F.array_repeat(F.lit(None).cast(elem_t), d),
            F.slice(arr, 1, F.greatest(F.size(arr) - d, F.lit(0))),
        )

    cur = hashed
    m_col, span, lvl = "hs", 1, 0
    while span < w:
        step = min(span, w - span)
        nxt = f"__m{lvl}"
        cur = cur.select(
            "id", "hs",
            F.zip_with(
                F.col(m_col), _shift(F.col(m_col), step),
                lambda x, y: F.least(x, y),
            ).alias(nxt),
        )
        m_col, span, lvl = nxt, span + step, lvl + 1
    sel = F.filter(
        F.zip_with(F.col("hs"), F.col(m_col), lambda x, mn: F.when(x == mn, x)),
        lambda x: x.isNotNull(),
    )
    arr = F.array_distinct(sel) if distinct else sel
    return cur.select("id", F.explode(arr).alias("fp"))


#: PII patterns — deliberately simple, deterministic regexes (real
#: pipelines layer model-based NER on top; the plumbing is identical).
#: Patterns avoid lookarounds so they behave the same under Java regex
#: (Spark) and RE2 (DuckDB/ripgrep-style engines).
PII_PATTERNS = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "PHONE": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "IPV4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "SSN": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def redact_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """Replace PII spans with ``[KIND]`` tokens — the standard scrub
    pass before training-corpus release. Pure regexp_replace chain
    (codegen, scan-time); order matters: SSN/IPV4 before PHONE so the
    generic digit-run pattern can't swallow the structured forms."""
    out = text
    for kind in kinds or ["EMAIL", "SSN", "IPV4", "PHONE"]:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind}]")
    return out


def pii_counts(text: Column, kinds: list[str] | None = None) -> Column:
    """Struct of per-kind PII match counts — the audit/reporting face
    of redact_pii (count before you scrub). Counts follow redact_pii's
    precedence exactly: each kind is counted on the text with the
    earlier kinds already redacted, so an SSN is counted once as `ssn`
    and never double-counted by the generic PHONE digit-run pattern —
    the audit equals what redact_pii actually replaces."""
    order = kinds or ["EMAIL", "SSN", "IPV4", "PHONE"]
    counts: dict[str, Column] = {}
    cur = text
    for kind in order:
        pat = PII_PATTERNS[kind]
        counts[kind] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, f"[{kind}]")
    return F.struct(
        *[counts[k].alias(k.lower()) for k in PII_PATTERNS if k in counts]
    )


def dup_word_fraction(text: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token —
    1 - distinct/total. One of the Gopher-style repetition signals
    (Rae et al. 2021 §A1.1: 'duplicate n-gram fraction' family) used
    to drop boilerplate/spam before training."""
    t = tokens(text)
    return F.round(1.0 - _ratio(F.size(F.array_distinct(t)), F.size(t)), 6)


def dup_line_fraction(text: Column) -> Column:
    """Fraction of newline-separated lines that are duplicates of an
    earlier line (Gopher repetition rule #1)."""
    lines = F.split(text, r"\n")
    return F.round(
        1.0 - _ratio(F.size(F.array_distinct(lines)), F.size(lines)), 6
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Per-document repetition profile: duplicate-word and
    duplicate-line fractions (column expressions) plus the fraction of
    n-grams accounted for by the single most frequent n-gram
    (top_ngram_fraction — Gopher's 'top n-gram fraction' rule).

    Scale shape: the n-gram mode cannot be a column expression without
    interpreted array lambdas, so it is explode → count per (doc,
    gram) → max/sum per doc: two hash-aggregate shuffles keyed by doc,
    no joins against the corpus, linear in total token count."""
    docs = spread(docs)
    base = docs.select(
        F.col(id_col).alias("id"),
        dup_word_fraction(F.col(text_col)).alias("dup_word_frac"),
        dup_line_fraction(F.col(text_col)).alias("dup_line_frac"),
        tokens(F.col(text_col)).alias("t"),
    )
    pos = base.select(
        "id", "t",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("t") - (n - 1), F.lit(1)))
        ).alias("i"),
    )
    grams = pos.select(
        "id", F.array_join(F.slice("t", F.col("i"), n), " ").alias("g")
    )
    per_gram = grams.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    top = per_gram.groupBy("id").agg(
        F.round(
            F.max("c").cast("double") / F.sum("c").cast("double"), 6
        ).alias("top_ngram_frac")
    )
    return (
        base.select("id", "dup_word_frac", "dup_line_frac")
        .join(top, "id")
        .withColumnRenamed("id", id_col)
    )


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Frequency-ranked vocabulary: (token, token_id, count) with
    token_id 1..vocab_size assigned by (count desc, token asc) — a
    deterministic, engine-portable id assignment (0 is reserved for
    OOV by encode_tokens).

    Scale shape: the corpus-sized work is ONE token hash-aggregate
    (map-side partials). The final rank is a global row_number, so the
    candidate set is first cut to the exact global top-vocab_size
    SUPERSET with a keyed per-bucket top-K (any global top-K token is
    in its bucket's top-K): the single-partition sort then sees at
    most 32·vocab_size rows no matter how large the distinct-token
    table grows — the Heaps'-law vocabulary never funnels through one
    task."""
    from pyspark.sql.window import Window

    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    wb = Window.partitionBy("__b").orderBy(F.desc("count"), F.col("token"))
    cand = (
        counts.withColumn("__b", F.pmod(F.xxhash64("token"), F.lit(32)))
        .withColumn("__bk", F.row_number().over(wb))
        .filter(F.col("__bk") <= vocab_size)
        .drop("__b", "__bk")
    )
    w = Window.orderBy(F.desc("count"), F.col("token"))
    return (
        cand.withColumn("token_id", F.row_number().over(w))
        .filter(F.col("token_id") <= vocab_size)
    )


def encode_tokens(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-id encoding: (doc_id, token_ids array) with ids from
    ``vocab`` (build_vocab's schema) and 0 for out-of-vocabulary —
    the tokenize→ids step in front of sequence packing.

    Plan: posexplode → broadcast-join the (small by construction)
    vocab → one keyed collect, order restored by sorting the
    (position, id) structs inside the aggregate's result — no window,
    one shuffle on doc id."""
    pos = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("__pos", "token"),
    )
    enc = pos.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        id_col, "__pos",
        F.coalesce("token_id", F.lit(0)).cast("int").alias("__tid"),
    )
    return enc.groupBy(id_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("__pos", "__tid"))),
            lambda s: s["__tid"],
        ).alias("token_ids")
    )


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) —
    the classic cheap quality signal (low ratio = repetitive
    boilerplate, near-1 ratio = high-entropy noise; natural prose sits
    in between). Used as a filter stage alongside the Gopher
    repetition rules.

    No column-expression form exists (Spark has no zlib expression),
    so this is an Arrow-batched pandas UDF — CPU-bound, linear, no
    shuffle; deterministic for a fixed zlib version, which is why it
    stays a library+unit-test surface rather than a cross-engine
    oracle query."""
    import pandas

    from pyspark.sql.functions import pandas_udf

    def _ratio(s: "pandas.Series") -> "pandas.Series":
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return s.map(one)

    # explicit annotations resolvable at decoration time (the module
    # uses `from __future__ import annotations`, so inline hints would
    # be unresolvable strings to pyspark's eval-type inference)
    _ratio.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    _ratio_udf = pandas_udf(_ratio, "double")

    return docs.select(
        F.col(id_col), _ratio_udf(F.col(text_col)).alias("compression_ratio")
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-bounded chunks — the
    standard pre-tokenization step of a training pipeline (and of RAG
    indexing). Chunk c starts at token c*(chunk_tokens-overlap); a
    start is emitted while it still contributes unseen tokens
    (start == 0 or start < n_tokens - overlap), so no chunk is fully
    contained in its predecessor.

    All JVM-side: tokenize → explode the (filtered) start grid →
    slice + join. Chunk identity is (doc_id, chunk_id) with
    chunk_id = start/stride — deterministic under any partitioning.
    Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    docs = spread(docs)
    base = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    ).withColumn("n", F.size("t"))
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s == 0) | (s < F.col("n") - overlap),
    )
    ex = base.select("id", "t", "n", F.explode(starts).alias("s"))
    return ex.select(
        F.col("id").alias(id_col),
        (F.col("s") / F.lit(stride)).cast("long").alias("chunk_id"),
        F.least(F.lit(chunk_tokens), F.col("n") - F.col("s")).alias(
            "n_chunk_tokens"
        ),
        F.array_join(
            F.slice("t", F.col("s") + 1, chunk_tokens), " "
        ).alias("chunk_text"),
    )


def boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Lines that appear in ≥ ``min_docs`` DISTINCT documents — the
    corpus-level boilerplate census (CCNet §4.1 / Gopher C.2 line-dedup
    family: navigation chrome, cookie banners, license headers repeat
    VERBATIM across pages and are removed by cross-document line
    frequency, which per-document repetition signals can't see).

    Scale shape: explode lines → ONE hash-aggregate with map-side
    partial ``count(DISTINCT id)`` — no self-join, no window; the
    shuffle carries (line, id) pairs once. ``min_chars`` drops empty/
    whitespace lines from the census. Output: (line, n_docs)."""
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\n")).alias("line"),
    ).filter(F.length(F.trim(F.col("line"))) >= min_chars)
    return (
        lines.groupBy("line")
        .agg(F.count_distinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Strip corpus-boilerplate lines from every document (see
    :func:`boilerplate_lines`), preserving the remaining lines' order.

    Plan: posexplode lines → left-anti join against the boilerplate
    set (a SHUFFLE join — the set scales with the corpus and is not
    broadcast) → reassemble per doc via array_sort(collect_list(
    struct(pos, line))). One explode, one agg, one join, one agg —
    every step keyed, no window. Docs whose every line is boilerplate
    come back with empty text (kept, so downstream length filters
    decide their fate). Output: (id_col, text_col, n_removed)."""
    bp = boilerplate_lines(docs, text_col, id_col, min_docs, min_chars)
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    )
    kept = ex.join(bp.select("line"), "line", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("__text"),
        F.count(F.lit(1)).alias("__kept"),
    )
    n_lines = F.size(F.split(F.col(text_col), r"\n"))
    return (
        docs.select(F.col(id_col), n_lines.alias("__total"))
        .join(rebuilt.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__text"), F.lit("")).alias(text_col),
            (F.col("__total") - F.coalesce(F.col("__kept"), F.lit(0)))
            .alias("n_removed"),
        )
    )


def _require_integral_id(docs: DataFrame, id_col: str, where: str) -> None:
    """The span-census occurrence key is integer arithmetic over the id;
    a string or fractional id would wrap or go NULL silently."""
    dt = docs.schema[id_col].dataType.simpleString()
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"{where} needs an integral {id_col!r} (got {dt}); "
            "map ids to longs first"
        )


def _gram_hashes(toks: Column, n: int) -> Column:
    """xxhash64 of every word ``n``-gram of a token array, as an array
    (one element per start position, in position order). A higher-order
    transform — interpreted, never whole-stage codegen. Hot corpus
    paths (repeated_spans, lm_scores, DSIR) use the faster codegen
    form instead: explode the positions and hash
    ``array_join(slice(toks, i, n))`` per row INSIDE the same codegen
    stage, pruning the array before any exchange (same strings → same
    hashes; the old O(len²)-bytes worry only applies when the carried
    array crosses a row-materialization boundary, which that shape
    avoids). This array form remains for callers that need the hashes
    as a per-doc ARRAY column (decontaminate's eval-gram broadcast,
    repetition profiles — small inputs by construction).
    Docs shorter than ``n`` tokens yield an empty array."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.xxhash64(F.array_join(F.slice(toks, i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    n: int = 8,
    min_matches: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing
    ≥ ``min_matches`` distinct word ``n``-grams with ANY document of
    the evaluation set (the GPT-3 appendix-C / PaLM n-gram-overlap
    sweep run before every serious training job).

    Scale shape: the eval set is SMALL by nature → its distinct gram
    hashes broadcast; the 100 TB training side computes its gram-hash
    ARRAY per doc row (higher-order transform — the exploded rows then
    carry only 8-byte hashes, never the token array itself) and
    broadcast-inner-joins — no shuffle of corpus grams at all, then one
    keyed count-distinct. Normalization (lower + whitespace collapse)
    matches the dedup family so the same grams collide. Output: every
    doc as (id_col, n_matches, contaminated)."""
    eval_text_col = eval_text_col or text_col

    def grams(df: DataFrame, col: str, idc: str | None):
        toks = df.select(
            *([F.col(idc).alias("id")] if idc else []),
            tokens(F.col(col)).alias("t"),
        )
        hashed = toks.select(
            *(["id"] if idc else []),
            _gram_hashes(F.col("t"), n).alias("ghs"),
        )
        return hashed.select(
            *(["id"] if idc else []), F.explode("ghs").alias("gh")
        )

    eval_grams = grams(eval_docs, eval_text_col, None).distinct()
    doc_grams = grams(docs, text_col, id_col)
    matches = (
        doc_grams.join(F.broadcast(eval_grams), "gh")
        .groupBy("id")
        .agg(F.count_distinct("gh").alias("n_matches"))
    )
    return (
        docs.select(F.col(id_col))
        .join(matches.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_matches"), F.lit(0)).alias("n_matches"),
            (F.coalesce(F.col("n_matches"), F.lit(0)) >= min_matches)
            .alias("contaminated"),
        )
    )


def repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    keep_first: bool = True,
) -> DataFrame:
    """Exact repeated-substring detection (the Lee et al., ACL'22
    "Deduplicating Training Data Makes Language Models Better"
    ExactSubstr family, word-granular): find every maximal token span
    that also occurs elsewhere in the corpus — verbatim quotes, mirrored
    articles, templated passages — as mergeable cover intervals of the
    duplicated word ``k``-grams. The paper builds a corpus-wide suffix
    array (inherently sequential); the distributed equivalent is a
    k-gram-anchor census: a span of length ≥ k repeats iff each of its
    k-grams repeats, so duplicated-gram cover intervals recover the
    same regions with resolution k.

    Semantics: a (doc, position) k-gram occurrence is DUPLICATED when
    the same gram text (lower + whitespace-collapsed, matching the
    dedup family) occurs anywhere else in the corpus — other docs or
    the same doc. With ``keep_first`` the globally-minimal occurrence
    (smallest ``(id, pos)``) of each gram is exempt, so one canonical
    copy of every duplicated passage survives removal (the paper's
    all-but-one discipline). Marked occurrences cover tokens
    ``[pos, pos+k)``; overlapping/adjacent covers merge per doc.

    Scale shape: explode gram positions and hash each slice inside ONE
    whole-stage-codegen stage (the token array never crosses a row
    boundary — gh is projected out before the exchange, so only
    (id, pos, gh) 20-byte rows shuffle) → census as a full-frame
    WINDOW over gh (count + min occurrence key in one pass — the
    earlier groupBy-then-join-back shape computed the corpus-sized
    gram scan TWICE and shuffled it twice) → per-doc interval merge as
    two native window passes over (id, pos) plus a hash aggregate on
    (id, run): a span opens where the gap to the previous duplicated
    position exceeds k, the running sum of those breaks numbers the
    merged runs, and min/max-per-run recovers [s, e). Everything
    JVM-side and linear — the gram hashing is codegen (an A/B against
    the higher-order-transform form measured the interpreted lambda at
    ~1.3x, and the original fold-merge at ~2.3x, this plan).

    Returns (id_col, span_start, span_end): 1-based token offsets,
    end exclusive, one row per merged duplicated span.
    """
    _require_integral_id(docs, id_col, "repeated_spans")
    toks = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    )
    # grams hashed per exploded position, all codegen: the carried
    # token array lives only inside this one codegen stage (pruned
    # before any exchange), so there is no O(len^2) materialization
    occ = (
        toks.filter(F.size("t") >= k)
        .select(
            "id", "t",
            F.explode(
                F.sequence(F.lit(1), F.size("t") - (k - 1))
            ).alias("i"),
        )
        .select(
            "id",
            F.col("i").alias("pos"),
            F.xxhash64(
                F.array_join(F.slice("t", F.col("i"), k), " ")
            ).alias("gh"),
        )
    )
    # single-BIGINT occurrence key: min() over it picks the smallest
    # (id, pos) pair — deterministic and portable to the SQL oracle
    # (struct-min ordering differs across engines). Positions are
    # bounded by doc token counts (< 1e9 by any practical measure);
    # the long cast keeps int ids from wrapping in the product, and
    # ids must stay below ~9.2e9 (enforced structurally: integral id
    # required above, overflow would need a 10-digit id space).
    okey = F.col("id").cast("long") * F.lit(1_000_000_000) + F.col(
        "pos"
    ).cast("long")
    # census in ONE pass over one shuffle of the (id, pos, gh) rows: a
    # full-frame window by gh replaces the groupBy + join-back, which
    # recomputed the corpus gram scan twice and shuffled it twice
    from pyspark.sql import Window

    wg = Window.partitionBy("gh")
    marked = occ.select(
        "id", "pos",
        okey.alias("ok"),
        F.count(F.lit(1)).over(wg).alias("n_occ"),
        F.min(okey).over(wg).alias("min_ok"),
    ).filter(F.col("n_occ") > 1)
    if keep_first:
        marked = marked.filter(F.col("ok") != F.col("min_ok"))
    # merge covers [pos, pos+k) into maximal spans: with one fixed
    # span length, ends are monotone in starts, so a new merged run
    # opens exactly when pos > prev_pos + k (strict: pos == prev+k is
    # adjacency and merges, end being exclusive). lag + running-sum
    # share one sort under the same (id, pos) window spec, and the
    # (id, run) aggregate reuses the window's hash partitioning on id
    # — no shuffle beyond the keyed pass the old collect_list paid.
    w = Window.partitionBy("id").orderBy("pos")
    runs = marked.select(
        "id",
        "pos",
        F.when(
            F.col("pos") > F.lag("pos").over(w) + k, 1
        ).otherwise(0).alias("brk"),
    ).select("id", "pos", F.sum("brk").over(w).alias("run"))
    return runs.groupBy("id", "run").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + k).cast("long").alias("span_end"),
    ).select(
        F.col("id").alias(id_col), "span_start", "span_end"
    )


def remove_repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    keep_first: bool = True,
) -> DataFrame:
    """Strip the duplicated spans found by :func:`repeated_spans` from
    every document (normalized tokenization, matching the span
    offsets), keeping the canonical first occurrence when
    ``keep_first``. Docs keep their row even when fully covered (empty
    text — downstream length filters decide). One extra keyed
    collect + left join over the span pipeline; the rebuild is a
    per-row array filter. Output: (id_col, text_col,
    n_removed_tokens)."""
    spans = repeated_spans(docs, text_col, id_col, k, keep_first)
    per_doc = spans.groupBy(F.col(id_col).alias("id")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("sps")
    )
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
    joined = toks.join(
        per_doc.withColumnRenamed("id", id_col), id_col, "left"
    )
    kept = F.filter(
        F.col("t"),
        lambda x, i: ~F.exists(
            F.coalesce(
                F.col("sps"),
                F.array().cast(
                    "array<struct<span_start:long,span_end:long>>"
                ),
            ),
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 < s["span_end"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias(text_col),
        (F.size("t") - F.size(kept)).cast("long").alias("n_removed_tokens"),
    )


def term_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Corpus vocabulary census: per (normalized) token, document
    frequency and corpus term frequency — the input to vocabulary /
    BPE seeding, stop-list induction, and IDF weighting at corpus
    scale. ONE explode + ONE hash-aggregate (count + count-distinct
    share the grouping); no window, no join.
    Output: (token, df, tf)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).filter(F.length("token") > 0)
    return (
        toks.groupBy("token")
        .agg(
            F.count_distinct("id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
        )
        .filter(F.col("df") >= min_df)
    )


def doc_tfidf(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """Per-document top-k tokens by smoothed TF-IDF
    (``tf_d * (ln((N+1)/(df+1)) + 1)``) — keyword extraction over the
    corpus. Doc term counts and the document-frequency table are two
    keyed aggregates joined on token (shuffle join — the vocabulary
    scales with the corpus); top-k per doc is one keyed window.
    Deterministic tie-break (score desc, token asc).
    Output: (id_col, rank, token, tfidf)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).filter(F.length("token") > 0)
    tf_d = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf_d"))
    df_t = toks.select("id", "token").distinct().groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = docs.select(F.count_distinct(F.col(id_col)).alias("n"))
    scored = (
        tf_d.join(df_t, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf_d")
            * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("id").alias(id_col), "rank", "token",
            F.round("tfidf", 6).alias("tfidf"),
        )
    )


def quality_classifier_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 13,
) -> DataFrame:
    """Model-based quality filter PLUMBING (the fastText-classifier
    stage of C4/CCNet-style pipelines): a linear scorer over hashed
    token features, ``score = sigmoid(mean_t w(t))`` with per-token
    weights ``w(t) = 2*U(t) - 1`` drawn from the engine-portable md5
    uniform (pipeline/sampling's draw — any engine replays it
    bit-for-bit). The weights are a deterministic STAND-IN for trained
    ones (no model ships in this environment); the distributed shape —
    explode → codegen md5 per token row → one keyed mean — is exactly
    how a real hashed linear classifier runs at 100 TB.
    Output: (id_col, quality_score)."""
    from ..sources.random_gen import hash_uniform

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).filter(F.length("token") > 0)
    # DECIMAL-exact mean: double avg is partition-order-dependent in
    # the last ulps; summing 10dp-truncated weights is associative and
    # bit-identical on any engine/partitioning (same rule as the
    # unkeyed prefix sums)
    w = (2.0 * hash_uniform(F.col("token"), seed) - 1.0).cast(
        "decimal(28,10)"
    )
    agg = toks.groupBy("id").agg(
        (F.sum(w) / F.count(F.lit(1))).cast("double").alias("m")
    )
    return (
        docs.select(F.col(id_col))
        .join(agg.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            (1.0 / (1.0 + F.exp(-F.coalesce(F.col("m"), F.lit(0.0)))))
            .alias("quality_score"),
        )
    )


def lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    add_k: float = 1.0,
    lm_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document n-gram language-model score — the CCNet-style LM
    quality signal (Wenzek et al., LREC'20 train a 5-gram KenLM on
    Wikipedia and keep low-perplexity web docs; Gopher/C4 use the same
    shape). This is the statistical version: an add-k-smoothed word
    ``n``-gram model with ``P(w|ctx) = (c(ctx·w)+k) / (c(ctx)+k·V)``
    trained on ``lm_docs`` (default: the corpus itself —
    self-perplexity flags statistical outliers), scoring every doc by
    the mean negative log-likelihood of its n-grams (``avg_nll`` =
    ln-perplexity).

    Scale shape: training = two hash-aggregates over 8-byte gram
    hashes (n-gram and context counts; map-side partials) + one
    count-distinct for V; scoring = one position explode per doc with
    both hashes computed on the slice inside the same codegen stage
    (the token array never crosses a row boundary; exploded rows
    carry hashes only) → two shuffle joins against the count tables →
    one keyed average. Nothing leaves the JVM and no interpreted
    higher-order lambda remains on a corpus-sized path. Grams the
    model never saw score with count 0 (pure smoothing mass), so an
    external ``lm_docs`` corpus works unchanged.

    Output: (id_col, n_grams, avg_nll); docs shorter than ``n``
    tokens have n_grams=0 and NULL avg_nll (no evidence — downstream
    filters decide).
    """
    lm_docs = lm_docs if lm_docs is not None else docs

    tr = lm_docs.select(tokens(F.col(text_col)).alias("t"))

    # gram hashing in the codegen explode form (same strings → same
    # xxhash64 values as the _gram_hashes transform; the carried token
    # array is pruned before any exchange — see repeated_spans)
    def _hash_at(m: int) -> Column:
        return F.xxhash64(F.array_join(F.slice("t", F.col("i"), m), " "))

    def _gram_rows(m: int, alias: str) -> DataFrame:
        return (
            tr.filter(F.size("t") >= m)
            .select(
                "t",
                F.explode(
                    F.sequence(F.lit(1), F.size("t") - (m - 1))
                ).alias("i"),
            )
            .select(_hash_at(m).alias(alias))
        )

    gram_counts = (
        _gram_rows(n, "gh").groupBy("gh").agg(F.count(F.lit(1)).alias("c_gram"))
    )
    ctx_counts = (
        _gram_rows(n - 1, "ch").groupBy("ch").agg(F.count(F.lit(1)).alias("c_ctx"))
    )
    vocab = tr.select(F.explode("t").alias("w")).filter(
        F.length("w") > 0
    ).agg(F.count_distinct("w").alias("V"))

    # scoring: ONE explode yields both the gram hash and its context
    # hash per position (the former arrays_zip of two transform-built
    # hash arrays); positions run 1..len-n+1 exactly as before
    pairs = (
        docs.select(
            F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
        )
        .filter(F.size("t") >= n)
        .select(
            "id", "t",
            F.explode(
                F.sequence(F.lit(1), F.size("t") - (n - 1))
            ).alias("i"),
        )
        .select("id", _hash_at(n - 1).alias("ch"), _hash_at(n).alias("gh"))
    )
    scored = (
        pairs.join(gram_counts, "gh", "left")
        .join(ctx_counts, "ch", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            F.log(
                (F.coalesce(F.col("c_gram"), F.lit(0)) + F.lit(add_k))
                / (F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(add_k) * F.col("V"))
            ).alias("lp"),
        )
    )
    agg = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"), (-F.avg("lp")).alias("avg_nll")
    )
    return (
        docs.select(F.col(id_col))
        .join(agg.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.col("avg_nll"),
        )
    )


#: Gopher rule 7's required stop words (Rae et al. 2021, arXiv:
#: 2112.11446 Appendix A): a document must contain at least 2.
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher quality-filter rule bundle (Rae et al. 2021,
    arXiv:2112.11446 Appendix A — the canonical heuristic pre-filter
    for LLM training corpora), one flag column per rule plus the
    conjunction:

    r1_word_count      word count in [min_words, max_words]
    r2_mean_word_len   mean word length in [3, 10]
    r3_symbol_ratio    hash-to-word AND ellipsis-to-word ratio <= 0.1
                       (the paper removes docs where EITHER exceeds)
    r4_bullet_lines    at most 90% of lines start with a bullet point
    r5_ellipsis_lines  at most 30% of lines end with an ellipsis
    r6_alpha_words     >= 80% of words contain an alphabetic character
    r7_stop_words      contains >= 2 of GOPHER_STOP_WORDS
    keep               all of the above

    Everything is whole-stage-codegen column arithmetic — linear scan,
    no shuffle, and the flags push into the parquet read when composed
    as filters. Tokens are the module's lowercased whitespace split,
    so rule 6/7 word checks are case-insensitive."""
    t = tokens(F.col(text_col))
    n_words = F.size(t)
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[•\-\*‣▶]"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"))
    )
    alpha = F.size(F.filter(t, lambda w: w.rlike("[a-z]")))
    hashes = F.length(F.regexp_replace(F.col(text_col), r"[^#]", ""))
    ellipses = F.size(F.split(F.col(text_col), r"(\.\.\.|…)")) - 1
    sw_hits = F.size(
        F.array_intersect(t, F.array(*[F.lit(w) for w in GOPHER_STOP_WORDS]))
    )
    # codegen concat+length, not an interpreted per-word fold — same
    # double (see avg_word_len)
    mwl = F.length(F.concat_ws("", t)) / n_words
    r = {
        "r1_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r2_mean_word_len": (mwl >= 3.0) & (mwl <= 10.0),
        "r3_symbol_ratio": (hashes <= n_words * 0.1)
        & (ellipses <= n_words * 0.1),
        "r4_bullet_lines": bullet <= n_lines * 0.9,
        "r5_ellipsis_lines": ellipsis_lines <= n_lines * 0.3,
        "r6_alpha_words": alpha >= n_words * 0.8,
        "r7_stop_words": sw_hits >= 2,
    }
    flags = [F.coalesce(c, F.lit(False)).alias(k) for k, c in r.items()]
    out = docs.select(F.col(id_col), *flags)
    all_pass = F.lit(True)
    for k in r:
        all_pass = all_pass & F.col(k)
    return out.select(
        id_col,
        *[F.col(k).cast("int").alias(k) for k in r],
        all_pass.cast("int").alias("keep"),
    )


def c4_filters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_lines: int = 3,
) -> DataFrame:
    """The C4 cleaning recipe (Raffel et al. 2020, arXiv:1910.10683
    §2.2 — the most-reused public corpus-cleaning rule set), as one
    zero-shuffle scan producing the cleaned text plus audit columns:

    line level (removed from the text):
      - lines not ending in terminal punctuation (. ! ? ")
      - lines with fewer than ``min_words_per_line`` words
      - lines containing the word "javascript" (case-insensitive)
    document level (``keep`` = 0, text still reported):
      - fewer than ``min_lines`` surviving lines
      - contains "lorem ipsum" (case-insensitive)
      - contains a curly brace (code, not prose)

    Output: (id, clean_text, n_lines_kept, n_lines_removed, keep).
    The paper also deduplicates three-sentence spans across documents
    and applies a bad-words list — span dedup is
    :func:`remove_repeated_spans`; a wordlist gate composes as a
    plain rlike filter. All expressions are whole-stage codegen."""
    lines = F.split(F.col(text_col), "\n")
    keep_line = (
        lambda ln: F.rtrim(ln).rlike(r'[.!?"]$')
        & (F.size(F.split(F.trim(ln), r"\s+")) >= min_words_per_line)
        & ~F.lower(ln).rlike("javascript")
    )
    kept = F.filter(lines, keep_line)
    clean = F.array_join(kept, "\n")
    doc_ok = (
        (F.size(kept) >= min_lines)
        & ~F.lower(F.col(text_col)).rlike("lorem ipsum")
        & ~F.col(text_col).contains("{")
    )
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(kept).alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).alias("n_lines_removed"),
        doc_ok.cast("int").alias("keep"),
    )


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
