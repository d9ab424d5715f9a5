"""csp.random parity (csp/random.py) — seeded stochastic sources.

Reference: ``poisson_timer(rate, seed)`` emits events with exponential
inter-arrival gaps (csp/random.py:17-46); ``brownian_motion(trigger,
drift, covariance)`` / ``brownian_motion_1d`` sample (geometric)
Brownian paths at trigger ticks (csp/random.py:69-166).

Spark-first with HASH-BASED randomness: every draw is a pure function
of the row's identity (md5 of seed|row-tag → 52-bit uniform), so a
generated stream is bit-identical regardless of partitioning, cluster
size, task retries, or AQE re-plans. ``F.rand(seed)`` is seeded per
PARTITION — its stream silently changes whenever the physical
partitioning does, which breaks reproducibility at scale (a retry or a
repartition yields different data). Hash draws also make the sources
verifiable by any engine with md5 (the DuckDB oracle reproduces them).

Gaps/increments are quantized to 1e-6 (µs resolution) BEFORE the
cumulative sum, so the running sums are over identical doubles in
identical order on every engine — bit-identical paths.
"""

from __future__ import annotations

import datetime as _dt
import math

from pyspark.sql import Column, SparkSession, Window
from pyspark.sql import functions as F

from ..core.ticks import GLOBAL_KEY, KEY, SEQ, TS, VALUE, TickStream

_U52 = float(1 << 52)


def hash_uniform(tag: Column, seed: int = 42) -> Column:
    """Uniform draw in (0,1): top 52 bits of md5(seed|tag), exactly
    representable in a double. Deterministic per (seed, tag) — no
    partition or ordering dependence."""
    h13 = F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)), tag)), 1, 13)
    return (F.conv(h13, 16, 10).cast("double") + 0.5) / F.lit(_U52)


def hash_normal(tag: Column, seed: int = 42) -> Column:
    """Standard normal via Box-Muller over two independent hash
    uniforms (seed and seed+1)."""
    u1 = hash_uniform(tag, seed)
    u2 = hash_uniform(tag, seed + 1)
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)


def poisson_timer(
    spark: SparkSession,
    rate: float,
    start: _dt.datetime,
    end: _dt.datetime,
    seed: int = 42,
    key: str = GLOBAL_KEY,
) -> TickStream:
    """Poisson-process event times in [start, end] at ``rate`` events/sec
    (csp/random.py:17-46). Gap_i = -ln(U_i)/rate quantized to µs; event
    time is the running sum of gaps. Over-generates by 4*sigma then
    filters to end, so the expected-count shortfall probability is
    negligible. The single-stream cumulative sum is one global window
    (inherent to one timer stream); generate per key for parallel use.
    """
    horizon = (end - start).total_seconds()
    n = max(int(rate * horizon + 4 * math.sqrt(rate * horizon)) + 1, 8)
    w = Window.orderBy("id")
    gaps = spark.range(0, n).withColumn(
        "gap",
        F.round(-F.log(hash_uniform(F.col("id").cast("string"), seed)) / F.lit(rate), 6),
    )
    times = gaps.withColumn("t", F.sum("gap").over(w))
    out = (
        times.filter(F.col("t") <= horizon)
        .select(
            F.lit(key).alias(KEY),
            # round, not floor: t is a sum of µs-quantized gaps, so t*1e6
            # sits within an ulp of an integer — floor would flip ±1µs on
            # summation-order differences (e.g. another engine's
            # segment-tree window sum); round absorbs them
            F.timestamp_micros(
                F.unix_micros(F.lit(start)) + F.round(F.col("t") * 1e6, 0).cast("long")
            ).alias(TS),
            F.lit(0).cast("long").alias(SEQ),
            F.col("t").alias(VALUE),
        )
    )
    return TickStream(out)


def brownian_motion(
    trigger: TickStream,
    drift: float = 0.0,
    vol: float = 1.0,
    x0: float = 0.0,
    seed: int = 42,
    geometric: bool = False,
) -> TickStream:
    """Sample a Brownian path at the trigger's tick times, per key
    (csp/random.py:69-166 brownian_motion/_1d). Increment over a gap of
    dt seconds ~ N(drift*dt, vol^2*dt) (µs-quantized); the path is the
    windowed cumulative sum — csp integrates the same SDE per trigger
    tick. ``geometric=True`` exponentiates (GBM: x0*exp(path))."""
    w = TickStream.order_window()
    df = trigger.df.select(KEY, TS, SEQ)
    dt_s = (
        F.unix_micros(F.col(TS))
        - F.unix_micros(F.lag(F.col(TS)).over(w))
    ) / 1e6
    df = df.withColumn("__dt", F.coalesce(dt_s, F.lit(0.0)))
    tag = F.concat_ws(
        "|", F.col(KEY), F.unix_micros(F.col(TS)).cast("string"),
        F.col(SEQ).cast("string"),
    )
    incr = F.round(
        F.lit(drift) * F.col("__dt")
        + F.lit(vol) * F.sqrt(F.col("__dt")) * hash_normal(tag, seed),
        6,
    )
    df = df.withColumn("__incr", incr)
    path = F.sum("__incr").over(w)
    value = (
        F.lit(x0) * F.exp(path) if geometric else F.lit(x0) + path
    )
    return TickStream(df.select(KEY, TS, SEQ, value.alias(VALUE)))


#: reference naming: csp.random.brownian_motion_1d (csp/random.py:135)
#: is the scalar form; our scalar form is the primary function.
brownian_motion_1d = brownian_motion


def brownian_motion_nd(
    trigger: TickStream,
    drift: list[float],
    covariance: list[list[float]],
    x0: list[float] | None = None,
    seed: int = 42,
) -> TickStream:
    """N-dimensional correlated Brownian path sampled at trigger ticks
    (reference csp/random.py:70-133 ``brownian_motion`` with a full
    covariance matrix; it returns a numpy-array edge — here an
    ArrayType(double) column).

    The covariance is CONSTANT per stream, so its Cholesky factor is
    computed once at plan-build time (numpy on the driver — a d×d
    matrix, not data) and folded into the column expressions:
    increment_vec = drift*dt + sqrt(dt) * L @ z with z the vector of
    d independent hash-normals (seed offset 2j per dimension, matching
    hash_normal's internal seed/seed+1 pair). Per-dimension running
    sums are windowed cumulative sums — all JVM-side after the
    constant fold; no per-row Python."""
    import numpy as _np

    d = len(drift)
    cov = _np.asarray(covariance, dtype=float)
    if cov.shape != (d, d):
        raise ValueError(f"covariance must be {d}x{d}, got {cov.shape}")
    L = _np.linalg.cholesky(cov)
    x0 = x0 or [0.0] * d
    w = TickStream.order_window()
    df = trigger.df.select(KEY, TS, SEQ)
    dt_s = (
        F.unix_micros(F.col(TS)) - F.unix_micros(F.lag(F.col(TS)).over(w))
    ) / 1e6
    df = df.withColumn("__dt", F.coalesce(dt_s, F.lit(0.0)))
    tag = F.concat_ws(
        "|", F.col(KEY), F.unix_micros(F.col(TS)).cast("string"),
        F.col(SEQ).cast("string"),
    )
    # d independent standard normals per tick
    for j in range(d):
        df = df.withColumn(f"__z{j}", hash_normal(tag, seed + 2 * j))
    # correlated increments: row i of L mixes z[0..i]
    for i in range(d):
        mix = F.lit(0.0)
        for j in range(i + 1):
            if L[i, j] != 0.0:
                mix = mix + F.lit(float(L[i, j])) * F.col(f"__z{j}")
        df = df.withColumn(
            f"__incr{i}",
            F.round(
                F.lit(float(drift[i])) * F.col("__dt")
                + F.sqrt(F.col("__dt")) * mix,
                6,
            ),
        )
    paths = [
        (F.lit(float(x0[i])) + F.sum(f"__incr{i}").over(w)).alias(f"__p{i}")
        for i in range(d)
    ]
    df = df.select(KEY, TS, SEQ, *paths)
    return TickStream(
        df.select(
            KEY, TS, SEQ,
            F.array(*[F.col(f"__p{i}") for i in range(d)]).alias(VALUE),
        )
    )
