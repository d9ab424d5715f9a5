"""Byte-pair-encoding tokenizer: sample-based training + distributed
apply — the missing middle of the tokenize story (build_vocab ranks
whole words; pack_offsets packs ids; BPE is what real pipelines run
between raw text and ids).

Training (Sennrich/Haddow/Birch, ACL'16) is inherently sequential —
each merge depends on the one before — so, exactly like every
production tokenizer (GPT-2's BPE, sentencepiece), it trains on a
BOUNDED deterministic sample of the corpus: Spark does the distributed
part (sample selection by the md5 identity draw + ONE word-frequency
hash-aggregate), the merge loop then runs driver-side over the
collected (distinct word -> count) table, which is Heaps'-law small.
Applying the trained merges IS corpus-sized and runs distributed as an
Arrow-batched pandas UDF with a per-batch word cache (web text repeats
words heavily, so most lookups hit the cache).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import tokens

#: end-of-word marker (the Sennrich convention — lets merges learn
#: suffixes like "est</w>" distinct from mid-word "est")
EOW = "</w>"


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_cap: int | None = 10_000,
    min_count: int = 1,
    seed: int = 42,
    id_col: str | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a deterministic sample of the
    corpus. Returns the ordered merge list (the tokenizer). Ties on
    pair frequency break lexicographically — deterministic across
    engines, partitionings, and runs.

    The merge loop is the textbook O(n_merges × |vocab| × word_len)
    rescan — right for the ≤ ~100k distinct words a training sample
    yields. (32k-merge production tokenizers use the incremental
    pair-index variant of the same algorithm; the sampling contract is
    identical.)
    """
    from ..pipeline.sampling import split_uniform

    src = docs
    if sample_cap is not None:
        n_total = src.count()
        if n_total > sample_cap:
            frac = sample_cap / n_total
            # sample key: a unique id when the caller has one (exact
            # ~frac of ROWS), else the text hash (duplicate texts then
            # stand or fall together — fine for tokenizer statistics)
            key = F.col(id_col) if id_col else F.xxhash64(F.col(text_col))
            src = src.filter(split_uniform(key, seed) < F.lit(frac))
    counts = (
        src.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]) + (EOW,): r["c"] for r in counts
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        pair, n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:  # nothing repeats — further merges are noise
            break
        merges.append(pair)
        a, b = pair
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize every document with a trained merge list: lowercase +
    whitespace-split (the dedup-family normalization), then greedy
    lowest-rank-first pair merging per word — the exact Sennrich
    inference rule, so any BPE implementation given the same merges
    reproduces the output. Distributed as one Arrow-batched pandas UDF
    (merges travel in the closure — a few KB); a per-batch word cache
    makes the common case a dict hit. Appends ``out_col``
    (array<string>) to ``docs``."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def _bpe(texts):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc(text):
            if not isinstance(text, str):  # NULL/NaN text → no tokens
                return []
            out: list[str] = []
            for w in text.lower().split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return pd.Series([enc(t) for t in texts])

    return docs.withColumn(out_col, _bpe(F.col(text_col)))


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The subword vocabulary a merge list induces (merged symbols in
    merge order — prepend your alphabet + EOW for the full table)."""
    return [a + b for a, b in merges]
