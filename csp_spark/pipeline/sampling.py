"""Deterministic, hash-based splits and samples for corpus curation.

A 100 TB training pipeline needs train/val/test assignment and
down-sampling that is (a) reproducible across runs and engines,
(b) independent of partitioning/ordering, and (c) a pure column
expression so it fuses into the scan (predicate pushdown keeps a
`split='val'` read from touching the other 90% of row groups after a
partitioned write). `df.sample`/`sampleBy` give none of these —
they reseed per partition.

Mechanism: the md5→52-bit uniform of sources/random_gen.py
(`hash_uniform`) keyed on (seed | row id). Every draw is a pure
function of the row's identity, so the same doc lands in the same
split on any cluster, any partitioning, any engine with md5 — the
DuckDB oracles replay it bit-exactly.
"""

from __future__ import annotations

import math
import os
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.random_gen import hash_uniform

#: repeat_to_budget epoch-count guard (the dynamic-spawn cap's sibling
#: hazard): f_g = budget·w_g / tokens_g is a row MULTIPLIER, so a
#: mis-scaled budget or a weighted group with tiny token mass would
#: silently explode that group's rows by millions. Past the cap we
#: raise with the misconfigured groups named. Read at CALL time so a
#: user following the error's advice can set the env var in a live
#: session and retry.
def _max_epochs() -> int:
    return int(os.environ.get("CSP_SPARK_MAX_EPOCHS", "100"))


def split_uniform(id_col: Column, seed: int = 42) -> Column:
    """The (0,1) assignment draw for a row id — exposed so callers can
    bucket on it directly (e.g. partitioned writes by split)."""
    return hash_uniform(id_col.cast("string"), seed)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split with the given proportions by
    cumulative thresholds over the uniform draw. Ordered sequence, not
    a dict: the threshold intervals depend on order and must match the
    oracle. Weights must sum to 1 (the last split absorbs the
    remainder to be safe against float dust)."""
    u = split_uniform(F.col(id_col), seed)
    return df.withColumn(out_col, _split_expr(u, weights))


def _split_expr(u: Column, weights: Sequence[tuple[str, float]]) -> Column:
    """Cumulative-threshold split name from a (0,1) draw."""
    cond = None
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w
        cond = (
            F.when(u < F.lit(acc), F.lit(name))
            if cond is None
            else cond.when(u < F.lit(acc), F.lit(name))
        )
    return (
        cond.otherwise(F.lit(weights[-1][0]))
        if cond is not None
        else F.lit(weights[-1][0])
    )


def leakage_safe_split(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """:func:`hash_split` keyed on a GROUP id instead of the row id:
    every member of a duplicate/near-duplicate group — an exact-dup
    fingerprint, a :mod:`csp_spark.dedup.components` component id, a
    URL host — draws ONE split, so evaluation rows can never leak into
    train through surviving near-dups (Lee et al. ACL'22 measure the
    train-test contamination arising from exactly this). Rows with a
    NULL group fall back to their own ``id_col`` (ungrouped = their
    own group; the "__row:" prefix keeps a row id from colliding with
    a group id of the same string). Same md5 identity draw as every
    sampler here: partition-independent, engine-replayable, and a pure
    column expression — no shuffle; join the component/fingerprint
    column on beforehand."""
    key = F.coalesce(
        F.col(group_col).cast("string"),
        F.concat(F.lit("__row:"), F.col(id_col).cast("string")),
    )
    u = hash_uniform(key, seed)
    return df.withColumn(out_col, _split_expr(u, weights))


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~fraction of rows, chosen by row identity. Unlike
    df.sample this is stable under repartition/rerun and is a plain
    filter Catalyst can push into the scan."""
    return df.filter(split_uniform(F.col(id_col), seed) < F.lit(fraction))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    temperature: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Quality/temperature sampling: keep each row with probability
    ``clip(w, 0, 1) ** (1/temperature)`` where ``w`` is a per-row
    weight in [0, 1] (a quality or relevance score). ``temperature=1``
    keeps proportionally to the weight; ``t → 0`` sharpens toward
    keeping only w≈1 rows; ``t → ∞`` flattens toward keeping
    everything with w > 0. Same identity-hash draw as the other
    samplers — deterministic, partition-independent, a pure filter
    Catalyst pushes into the scan (weight permitting)."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    p = F.pow(
        F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0)),
        F.lit(1.0 / temperature),
    )
    u = split_uniform(F.col(id_col), seed)
    return df.filter(u < p)


def cap_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n: int,
    by: Column | str | None = None,
    descending: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``n`` rows per group (per-domain/source caps, the
    RefinedWeb-style guard against any one site dominating a corpus).

    Selection is deterministic: by the identity-hash uniform when
    ``by`` is None (an unbiased within-group sample, stable across
    partitionings), or by ranking on ``by`` (e.g. a quality score —
    "keep the n best per domain"); ties always break on the id.

    Plan: one shuffle on the group key + a per-group window. Exact-n
    semantics require ordering each group, so a pathologically heavy
    group sorts in one task — for corpora where a single group can
    exceed an executor's share, pre-thin heavy groups first with
    ``stratified_sample`` (approximate) and apply the exact cap to the
    survivors."""
    from pyspark.sql.window import Window

    if n <= 0:
        raise ValueError("n must be positive")
    if by is None:
        order = [split_uniform(F.col(id_col), seed).asc()]
    else:
        byc = F.col(by) if isinstance(by, str) else by
        order = [byc.desc() if descending else byc.asc()]
    w = Window.partitionBy(group_col).orderBy(*order, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages or
    quality buckets in a corpus): keep rows where the identity draw is
    under the stratum's fraction. One column expression — no shuffle,
    no per-stratum jobs; strata thresholds ride along as a CASE."""
    u = split_uniform(F.col(id_col), seed)
    cond = None
    for k, frac in fractions.items():
        branch = F.lit(frac)
        cond = (
            F.when(F.col(strata_col) == F.lit(k), branch)
            if cond is None
            else cond.when(F.col(strata_col) == F.lit(k), branch)
        )
    thresh = cond.otherwise(F.lit(default_fraction)) if cond is not None else F.lit(
        default_fraction
    )
    return df.filter(u < thresh)


def mix_to_budget(
    df: DataFrame,
    weights: Mapping[str, float],
    token_budget: int | float,
    token_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic domain-mixture sampling to a token budget — the
    Pile/DoReMi-style mixture step ahead of training: each group
    ``g`` keeps rows with probability
    ``min(1, budget·w_g / tokens_g)`` (weights normalized to sum 1),
    so the kept token mass approaches ``token_budget`` split per the
    weights; groups absent from ``weights`` are dropped. A weight
    whose implied keep fraction exceeds 1 keeps the whole group (no
    oversampling — pair with weighted/temperature sampling upstream
    if a group must repeat).

    Selection is the md5 identity draw — partition/engine-independent
    and replayable in SQL. Cost: ONE per-group totals aggregate
    (tiny, broadcast back) + a scan-pushable filter; the corpus
    itself never shuffles. Output: kept rows + ``keep_frac``.
    """
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum positive")
    norm = {k: v / wsum for k, v in weights.items()}
    totals = df.groupBy(group_col).agg(F.sum(token_col).alias("__tok"))
    wmap = F.create_map(
        *[F.lit(x) for kv in norm.items() for x in kv]
    )
    # try_element_at: NULL (not an ANSI error) for unweighted groups;
    # the when() gate matters because least(1.0, NULL) skips NULLs
    # and would keep unweighted groups WHOLE instead of dropping them
    # try_divide: a weighted zero-token group is NULL → dropped (no
    # ANSI DIVIDE_BY_ZERO), same contract as repeat_to_budget
    raw = F.try_divide(
        F.lit(float(token_budget))
        * F.try_element_at(wmap, F.col(group_col)),
        F.col("__tok"),
    )
    fr = totals.select(
        group_col,
        F.when(raw.isNotNull(), F.least(F.lit(1.0), raw)).alias(
            "keep_frac"
        ),
    ).filter(F.col("keep_frac").isNotNull())
    return (
        df.join(F.broadcast(fr), group_col)
        .filter(split_uniform(F.col(id_col), seed) < F.col("keep_frac"))
    )


def repeat_to_budget(
    df: DataFrame,
    weights: Mapping[str, float],
    token_budget: int | float,
    token_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Mixture sampling WITH oversampling — the multi-epoch form of
    :func:`mix_to_budget` (Pile table 1 / Llama data recipes repeat
    small high-quality sources several times per training run): each
    group's target fraction ``f_g = budget·w_g / tokens_g`` is NOT
    clamped at 1 — a group emits ``floor(f_g)`` full epochs plus one
    md5-sampled partial epoch of fraction ``f_g - floor(f_g)``, so
    the emitted token mass approaches ``budget·w_g`` exactly. Groups
    absent from ``weights`` are dropped. Output rows gain ``epoch``
    (0-based; every full epoch repeats the whole group, the last
    epoch is the deterministic md5 subset — the same identity draw as
    every sampler here, so it is partition-independent and replayable
    in SQL) and ``target_frac`` (f_g, 6dp).

    Spark shape: ONE tiny per-group totals aggregate broadcast back,
    then the corpus scan exploding ``sequence(0, floor(f_g))`` — the
    row multiplier is exactly the epoch count, the corpus itself
    never shuffles, and the filter fuses into the generate. floor()
    agrees across engines because f_g is the same IEEE double in
    both: literal·literal / exact-integer-total, one multiply and
    one divide.

    Guard: any group with ``floor(f_g)`` past ``CSP_SPARK_MAX_EPOCHS``
    (default 100) raises — the row multiplier IS the epoch count, so a
    mis-scaled budget would otherwise silently explode the output."""
    if any(v < 0 for v in weights.values()):
        # a negative weight would make f negative: floor(f) < 0 turns
        # sequence(0, n_full) DESCENDING and emits negative epochs
        # (mix_to_budget's clamp path just drops such groups)
        raise ValueError("weights must be non-negative")
    for c in ("epoch", "target_frac", "__tok", "__f"):
        if c in df.columns:
            raise ValueError(
                f"repeat_to_budget: input already has a column {c!r} "
                "(would be overwritten or made ambiguous) — rename it "
                "first"
            )
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum positive")
    norm = {k: v / wsum for k, v in weights.items()}
    totals = df.groupBy(group_col).agg(
        F.sum(token_col).cast("double").alias("__tok")
    )
    wmap = F.create_map(*[F.lit(x) for kv in norm.items() for x in kv])
    # try_divide: a weighted group whose token sum is 0 yields NULL
    # (not an ANSI DIVIDE_BY_ZERO, not an Infinity epoch count) and is
    # dropped by the isNotNull filter — it has no token mass to emit
    f_g = F.try_divide(
        F.lit(float(token_budget))
        * F.try_element_at(wmap, F.col(group_col)),
        F.col("__tok"),
    )
    fr = totals.select(
        group_col,
        F.col("__tok"),
        f_g.alias("__f"),
    ).filter(F.col("__f").isNotNull())
    # Epoch-count guard: fr is ≤ len(weights) rows by construction, so
    # validating it driver-side is one tiny job — and the rebuilt
    # literal frame carries the SAME IEEE doubles back into the plan,
    # so downstream arithmetic (and the cross-engine oracle) is
    # unaffected. floor(f_g) is the group's row multiplier; fail
    # loudly instead of silently emitting millions of epochs (or,
    # past int64, a wrong epoch count from a saturating cast).
    max_epochs = _max_epochs()
    fr_rows = fr.collect()
    bad = [
        (r[group_col], float(r["__f"]))
        for r in fr_rows
        if not math.isfinite(r["__f"]) or int(r["__f"]) > max_epochs
    ]
    if bad:
        worst = ", ".join(f"{g!r}: f={f:.6g}" for g, f in bad[:5])
        raise ValueError(
            f"repeat_to_budget: {len(bad)} group(s) would repeat for "
            f"more than {max_epochs} epochs ({worst}) — almost "
            "certainly a mis-scaled token_budget or a weighted group "
            "with near-zero token mass. Fix the budget/weights, or "
            "raise CSP_SPARK_MAX_EPOCHS if the oversampling is "
            "intentional."
        )
    fr = df.sparkSession.createDataFrame(fr_rows, fr.schema)
    # int cast is safe: the guard above already rejected any floor(f)
    # past the epoch cap, so the value fits int32 (a user raising the
    # env cap past 2^31 epochs has bigger problems); keeping the
    # epoch column int keeps the output schema stable
    n_full = F.floor(F.col("__f")).cast("int")
    return (
        df.join(F.broadcast(fr), group_col)
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), n_full)).alias("epoch"),
        )
        .filter(
            (F.col("epoch") < n_full)
            | (
                split_uniform(F.col(id_col), seed)
                < (F.col("__f") - n_full.cast("double"))
            )
        )
        .withColumn("target_frac", F.round(F.col("__f"), 6))
        .drop("__tok", "__f")
    )
