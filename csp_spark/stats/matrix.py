"""Pairwise matrix statistics — csp.stats cov_matrix / corr_matrix
(csp/stats.py:2337-2393, 2694-2745; numpy kernels _cspnpstatsimpl).

The reference carries an np-array-valued edge (one element per series)
and emits a matrix per tick. Spark-first re-expression (SURVEY.md §2.5
'cov_matrix' row): series live in LONG format as the tick table's key
column; the matrix is the set of (key_i, key_j) pairs, computed with a
self-equi-join on coincident tick times + one groupBy — both
shuffle-on-key, so the computation parallelizes over pairs instead of
vectorizing per row. (The reference recommends np-array edges to scale
to thousands of series — Use-Statistical-Nodes.md:51-68; key
partitioning is the Spark-native form of the same idea.)
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.ticks import KEY, SEQ, TS, TickStream


def _pairs(x: TickStream, include_diagonal: bool = True) -> DataFrame:
    """Coincident-tick pair frame: (key_a, key_b, ts, seq, va, vb) for
    key_a <= key_b. Matrix stats in csp consume one np-array tick where
    all series update together; the equi-join on (ts, seq) is exactly
    that coincidence."""
    a = x.df.select(
        F.col(KEY).alias("key_a"), TS, SEQ, F.col(x.value_col).alias("va")
    )
    b = x.df.select(
        F.col(KEY).alias("key_b"), TS, SEQ, F.col(x.value_col).alias("vb")
    )
    cond = F.col("key_a") <= F.col("key_b") if include_diagonal else (
        F.col("key_a") < F.col("key_b")
    )
    return a.join(b, on=[TS, SEQ], how="inner").filter(cond)


def cov_matrix(x: TickStream, ddof: int = 1) -> DataFrame:
    """Full-window covariance matrix entries: (key_a, key_b, cov).
    Upper triangle incl. diagonal (symmetric — mirror for the rest)."""
    p = _pairs(x)
    n = F.count(F.lit(1))
    cov = F.covar_pop("va", "vb") * n / (n - F.lit(ddof))
    return (
        p.groupBy("key_a", "key_b")
        .agg(F.when(n > ddof, cov).alias("cov"))
    )


def corr_matrix(x: TickStream) -> DataFrame:
    """Full-window correlation matrix entries: (key_a, key_b, corr)."""
    return (
        _pairs(x)
        .groupBy("key_a", "key_b")
        .agg(F.corr("va", "vb").alias("corr"))
    )


def cov_corr_matrix(x: TickStream, ddof: int = 1) -> DataFrame:
    """cov_matrix + corr_matrix fused over ONE coincident-pair frame:
    (key_a, key_b, cov, corr). Composing the two separate functions
    plans the self-equi-join twice and joins the two aggregates back
    together (two pair shuffles + a result join); a consumer that
    wants both matrices pays one pair join and one aggregate here —
    the per-group expressions are identical to the standalone forms,
    so the values match them exactly."""
    p = _pairs(x)
    n = F.count(F.lit(1))
    cov = F.covar_pop("va", "vb") * n / (n - F.lit(ddof))
    return (
        p.groupBy("key_a", "key_b")
        .agg(
            F.when(n > ddof, cov).alias("cov"),
            F.corr("va", "vb").alias("corr"),
        )
    )


def rolling_cov_matrix(
    x: TickStream, interval: int | _dt.timedelta, ddof: int = 1
) -> DataFrame:
    """Per-tick rolling covariance matrix entries:
    (key_a, key_b, ts, seq, cov) — one row per pair per coincident tick,
    windowed like csp's rolling cov_matrix(interval). Window partitions
    by PAIR, so work scales over pairs x window, all JVM-side."""
    p = _pairs(x)
    if isinstance(interval, int):
        w = (
            Window.partitionBy("key_a", "key_b")
            .orderBy(TS, SEQ)
            .rowsBetween(-(interval - 1), 0)
        )
        p2 = p
    else:
        from .rolling import causal_time_window

        us = (interval // _dt.timedelta(microseconds=1))
        p2 = p.withColumn("__tsu", F.unix_micros(F.col(TS)))
        tw, (lo, hi) = causal_time_window(["key_a", "key_b"], [SEQ], us)
        p2 = p2.withColumn("__tw", tw)
        w = (
            Window.partitionBy("key_a", "key_b")
            .orderBy("__tw")
            .rangeBetween(lo, hi)
        )
    n = F.count("va").over(w)
    cov = F.covar_pop("va", "vb").over(w) * n / (n - F.lit(ddof))
    return p2.select(
        "key_a", "key_b", TS, SEQ,
        F.when(n > ddof, cov).alias("cov"),
    )
