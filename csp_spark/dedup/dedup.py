"""Deduplication operators for training-data pipelines at 100 TB.

Four tiers, cheapest first — all shuffle-on-key designs where the key
is a (band of a) signature, so candidate generation never goes
quadratic; only verified candidates pay a pairwise comparison:

- exact:        hash-groupBy on normalized text (one shuffle)
- fingerprint:  xxhash64 of normalized tokens (near-exact)
- minhash LSH:  shingle → minhash sig → band buckets → in-bucket pairs
- simhash:      64-bit sign-aggregate of token hashes → hamming buckets
- ngram_jaccard: exact Jaccard on shingle sets for candidate pairs
- embedding near-dup: see csp_spark.similarity

All JVM-side: shingling via substring/transform, hashing via xxhash64,
signatures via higher-order array functions. No Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..text.analysis import tokens


def normalize(text: Column) -> Column:
    return F.array_join(tokens(text), " ")


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical (normalized) documents: one row per
    duplicated text with the canonical (min) id, member ids, count."""
    return (
        docs.groupBy(F.md5(normalize(F.col(text_col))).alias("text_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per normalized text."""
    w_min = F.min(id_col)
    keep = (
        docs.groupBy(F.md5(normalize(F.col(text_col))).alias("__h"))
        .agg(w_min.alias(id_col))
        .select(id_col)
    )
    return docs.join(keep, on=id_col, how="inner")


# ----------------------------------------------------------------------
# shingling + minhash
# ----------------------------------------------------------------------

def char_shingles(text: Column, k: int = 8) -> Column:
    """Distinct k-character shingles of the normalized text, computed
    JVM-side: transform over an index sequence + substring."""
    norm = normalize(text)
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(
        F.transform(idx, lambda i: norm.substr(i, F.lit(k)))
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles."""
    t = tokens(text)
    n = F.greatest(F.size(t) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n - 1)
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i + 1, k), " "))
    )


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """num_hashes-wide MinHash signature: permutation i is approximated
    by xxhash64(shingle, seed=i) (standard practice — e.g. Spark MLlib
    MinHashLSH uses seeded hash families)."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i)))
            ).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 8,
    threshold: float = 0.5,
    use_words: bool = False,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, verified
    with exact Jaccard over the shingle sets.

    Scale shape: explode to (band_id, band_hash) → shuffle by bucket →
    pairs only within buckets (collision probability s^(r) per band);
    the full cross-join never materializes. Exact-Jaccard verification
    touches only candidates.
    """
    rows_per_band = num_hashes // bands
    sh = (word_shingles if use_words else char_shingles)(
        F.col(text_col), shingle_k
    )
    base = docs.select(
        F.col(id_col).alias("id"), sh.alias("sh")
    ).withColumn("sig", minhash_signature(F.col("sh"), num_hashes))

    band_arr = F.array(
        *[
            F.xxhash64(
                F.array_join(
                    F.transform(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                ),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    banded = base.select(
        "id", "sh", F.posexplode(band_arr).alias("band", "bucket")
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle — the
    ground-truth counterpart to minhash_lsh_pairs (and its test oracle).
    Candidate generation via shingle-inverted-index join: shuffles on
    shingle, cost ∝ Σ bucket². For 100 TB use minhash_lsh_pairs; this
    one is for bounded corpora / verification."""
    sh = char_shingles(F.col(text_col), shingle_k)
    base = docs.select(F.col(id_col).alias("id"), sh.alias("sh"))
    sizes = base.select("id", F.size("sh").alias("n"))
    inv = base.select("id", F.explode("sh").alias("s"))
    inter = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            on=[F.col("a.s") == F.col("b.s"), F.col("a.id") < F.col("b.id")],
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("double").alias("inter"))
    )
    return (
        inter.join(sizes.alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(sizes.alias("sb"), F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a", "id_b",
            F.round(
                F.col("inter")
                / (F.col("sa.n") + F.col("sb.n") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ----------------------------------------------------------------------
# simhash
# ----------------------------------------------------------------------

def simhash(text: Column) -> Column:
    """64-bit SimHash of the token multiset: per bit, sign of the sum of
    ±1 contributions from each token's xxhash64. Pure higher-order
    array expressions — no explode, no shuffle. Bits are read from the
    two's-complement binary string (bin()) since Spark's shift
    functions take only literal counts."""
    t = tokens(text)
    # 64-char two's-complement bit string per token hash
    bitstrs = F.transform(
        t, lambda w: F.lpad(F.bin(F.xxhash64(w)), 64, "0")
    )
    # majority vote per bit position (1..64, MSB first)
    votes = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda p: F.aggregate(
            bitstrs,
            F.lit(0),
            lambda acc, s: acc
            + F.when(s.substr(p, F.lit(1)) == "1", 1).otherwise(-1),
        ),
    )
    sig_str = F.array_join(
        F.transform(votes, lambda v: F.when(v > 0, "1").otherwise("0")), ""
    )
    # assemble via two 32-bit halves (conv of a full unsigned 64-bit
    # value overflows LongType)
    hi = F.conv(F.substring(sig_str, 1, 32), 2, 10).cast("long")
    lo = F.conv(F.substring(sig_str, 33, 32), 2, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with simhash distance ≤ max_hamming, bucketed by
    16-bit chunks (pigeonhole: ≤3 differing bits over 4 chunks → at
    least one chunk identical), so candidate generation shuffles on
    chunk value instead of cross-joining."""
    base = docs.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh")
    )
    chunks = base.select(
        "id", "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sh", 16 * i).bitwiseAND(F.lit(0xFFFF)).cast("int")
                    for i in range(4)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    cand = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            on=[
                F.col("a.chunk_id") == F.col("b.chunk_id"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
