"""Sequence packing: concatenate documents into fixed-token-budget
training sequences ("context windows").

Training pipelines tokenize a corpus and emit sequences of exactly
``budget`` tokens. Two standard layouts:

- ``pack_offsets`` — concat-and-cut (the GPT-style default): shuffle
  the corpus deterministically, concatenate, and cut every ``budget``
  tokens; documents may straddle sequence boundaries. This is pure
  window arithmetic over a running token offset — one shuffle on the
  shard key, everything else stays in whole-stage codegen, and a SQL
  engine can replay it bit-exactly (the DuckDB oracle does).
- ``pack_next_fit`` — no-split greedy fill: walk the shard in order
  and start a new sequence whenever the next document doesn't fit.
  A sequential recurrence per shard (each bin's remaining capacity
  depends on the whole prefix), so it runs as an Arrow-batched
  per-shard fold in ``applyInPandas``; shards are embarrassingly
  parallel, so ``num_shards`` is the parallelism knob at 100 TB.

Both shard the corpus by a hash of the document id, so results are
reproducible on any cluster, any partitioning, any engine with md5
(same contract as pipeline/sampling.py). The reference engine has no
packing operator; this is part of the training-data extension surface
(brief: "operations a large-scale training-data pipeline would need").
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.random_gen import hash_uniform


def _sharded_ordered(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    order: str,
    seed: int,
) -> DataFrame:
    """Add deterministic `shard` and intra-shard order key `u`.

    shard = floor(U(id; seed+1) * num_shards) — identity-hash, so the
    same doc lands in the same shard on any engine. order="shuffle"
    draws an independent uniform (global deterministic shuffle — the
    standard pre-packing corpus shuffle); order="id" packs in id order
    (stable, easier to eyeball).
    """
    if order not in ("shuffle", "id"):
        raise ValueError(f"order must be 'shuffle' or 'id', got {order!r}")
    ident = F.col(id_col).cast("string")
    shard = F.floor(hash_uniform(ident, seed + 1) * num_shards).cast("int")
    u = (
        hash_uniform(ident, seed)
        if order == "shuffle"
        else F.lit(0.0)
    )
    return df.withColumn("shard", shard).withColumn("u", u)


def pack_offsets(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_shards: int = 64,
    order: str = "shuffle",
    seed: int = 42,
) -> DataFrame:
    """Concat-and-cut packing. Returns one row per document with its
    placement: ``shard``, ``begin_seq``/``end_seq`` (global sequence
    ids ``shard * 2**40 + bin``; a doc straddles when they differ),
    ``begin_offset`` (token offset inside begin_seq), and the shard-
    local running offset ``start_offset``.

    Plan shape: one hash-partition exchange on ``shard`` + one
    in-partition sort — the window is per shard, so parallelism =
    num_shards regardless of corpus size; no global window, no
    collect. The cumulative token offset is exact LONG arithmetic.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    t = _sharded_ordered(df, id_col, num_shards, order, seed)
    w = (
        Window.partitionBy("shard")
        .orderBy("u", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.col(token_col).cast("long")
    cum = F.sum(tok).over(w)
    start = (cum - tok).alias("start_offset")
    seq_base = F.col("shard").cast("long") * F.lit(1 << 40)
    return (
        t.select(
            F.col(id_col),
            "shard",
            tok.alias("n_tokens"),
            start,
            (cum - tok).alias("_s"),
            cum.alias("_e"),
        )
        .select(
            id_col,
            "shard",
            "n_tokens",
            "start_offset",
            (seq_base + F.floor(F.col("_s") / budget)).alias("begin_seq"),
            (
                seq_base
                + F.floor((F.greatest(F.col("_e") - 1, F.col("_s"))) / budget)
            ).alias("end_seq"),
            (F.col("_s") % budget).alias("begin_offset"),
        )
    )


def pack_next_fit(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_shards: int = 64,
    order: str = "shuffle",
    seed: int = 42,
) -> DataFrame:
    """No-split greedy packing: in shard order, append each document
    to the current sequence if it fits, else start a new one. A doc
    longer than ``budget`` gets a sequence of its own (callers filter
    or chunk oversized docs first — see text/analysis.chunk_documents).

    Returns (id, shard, n_tokens, seq LONG global id, offset inside
    the sequence). Per-shard sequential recurrence → Arrow-batched
    fold; the only shuffle is the groupBy(shard). The DuckDB oracle
    replays it with a recursive CTE (one row per shard per step), so
    the driver hash-checks this path too.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    t = _sharded_ordered(df, id_col, num_shards, order, seed).select(
        F.col(id_col), "shard", "u", F.col(token_col).cast("long").alias("n_tokens")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["u", id_col], kind="mergesort")
        toks = pdf["n_tokens"].to_numpy()
        bins = [0] * len(toks)
        offs = [0] * len(toks)
        b, fill = 0, 0
        for i, tk in enumerate(toks):
            tk = int(tk)
            if fill > 0 and fill + tk > budget:
                b, fill = b + 1, 0
            bins[i], offs[i] = b, fill
            fill += tk
        out = pdf[[id_col, "shard", "n_tokens"]].copy()
        out["seq"] = (pdf["shard"].astype("int64") * (1 << 40)) + pd.array(
            bins, dtype="int64"
        )
        out["offset"] = pd.array(offs, dtype="int64")
        return out

    id_type = dict(t.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, shard int, n_tokens long, seq long, offset long"
    )
    return t.groupBy("shard").applyInPandas(fold, schema=schema)


def sequence_manifest(
    packed: DataFrame,
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """The dataloader view of a ``pack_offsets`` layout: one row per
    (sequence, document segment) with the token slice to read —
    ``seq``, ``doc_from``/``doc_to`` (token range within the doc,
    end-exclusive) and ``seq_offset`` (where the segment starts inside
    the sequence). A doc straddling k boundaries contributes k+1
    segments; each sequence's segments tile it contiguously.

    Pure arithmetic + one explode over the spanned sequence ids — no
    shuffle beyond what pack_offsets already did (and none at all if
    its output was persisted)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    b = F.lit(budget)
    base = packed.filter(F.col("n_tokens") > 0).withColumn(
        "seq", F.explode(F.sequence(F.col("begin_seq"), F.col("end_seq")))
    )
    local_bin = F.col("seq") - F.col("shard").cast("long") * F.lit(1 << 40)
    bin_start = local_bin * b
    return base.select(
        F.col(id_col),
        "seq",
        F.greatest(bin_start - F.col("start_offset"), F.lit(0)).alias(
            "doc_from"
        ),
        F.least(
            F.col("n_tokens"), (local_bin + 1) * b - F.col("start_offset")
        ).alias("doc_to"),
        F.greatest(F.col("start_offset") - bin_start, F.lit(0)).alias(
            "seq_offset"
        ),
    )


def pack_stats(packed: DataFrame, budget: int, seq_col: str = "seq") -> DataFrame:
    """Per-sequence utilization for a ``pack_next_fit`` layout: docs,
    tokens, fill fraction. One keyed hash-aggregate."""
    return packed.groupBy(seq_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.sum("n_tokens") / F.lit(float(budget))).alias("fill"),
    )
