"""Functional csp.stats surface: reference users write
``csp.stats.mean(x, interval, min_window=...)`` (csp/stats.py:1686),
not a window-builder object. Each function here is a thin adapter
over the Rolling/RollingPair engine (rolling.py) or the EMA family
(ema.py) with the reference's signature shape, so reference stats
code is source-portable. All return TickStreams (value = statistic).

Stat-specific options mirror csp/stats.py: ``weights`` switches
sum/mean/var/stddev/sem to the weighted kernels (:1629/:1686/:2396),
``ddof``/``bias``/``excess`` match the variance and moment families,
``quant``/``interpolation`` the quantile surface (:1800),
``precision`` the unique() rounding (:1504). ``recalc`` is accepted
and ignored: its purpose in the reference is flushing the O(1)
incremental accumulators' float error (stats.py:218-282), and this
engine recomputes every window exactly, so there is no drift to
flush.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import functions as F

from ..core.ticks import TickStream
from .ema import ema as _ema_kernel
from .ema import ema_cov, ema_std, ema_var  # noqa: F401 (re-export)
from .rolling import Rolling, RollingPair

_Interval = "int | _dt.timedelta | None"


#: composite-key separator for element-indexed re-keying (unit sep)
_IDX_SEP = "\x1e"


def _is_array_stream(x) -> bool:
    return (
        isinstance(x, TickStream)
        and dict(x.df.dtypes)[x.value_col].startswith("array")
    )


def _arraywise(f):
    """np-array edge support for a single-input stat (reference numpy
    stats, csp/stats.py np kernels + Use-Statistical-Nodes.md:51-68):
    an array<double> edge computes ELEMENTWISE by re-keying each
    element index into its own series — Spark parallelizes over keys
    what csp vectorizes over arrays (SURVEY §1.3) — running the
    unchanged scalar kernel, and regrouping per-tick arrays. Gating
    streams (trigger/reset/sampler/weights) replicate across the
    (small) per-key index set."""
    import functools

    @functools.wraps(f)
    def wrapper(x, *args, **kw):
        if not _is_array_stream(x):
            return f(x, *args, **kw)
        from ..core.ticks import KEY, SEQ, TS, VALUE

        xdf = x.df.select(
            KEY, TS, SEQ,
            F.posexplode(x.value_col).alias("__i", VALUE),
        )
        keyed = TickStream(
            xdf.select(
                F.concat_ws(_IDX_SEP, KEY, F.col("__i")).alias(KEY),
                TS, SEQ, VALUE,
            )
        )
        idx = xdf.select(KEY, "__i").distinct()

        def replicate(s: TickStream) -> TickStream:
            return TickStream(
                s.df.join(idx, KEY).select(
                    F.concat_ws(_IDX_SEP, KEY, F.col("__i")).alias(KEY),
                    TS, SEQ, F.col(s.value_col).alias(VALUE),
                ),
            )

        kw2 = {
            k: (replicate(v) if isinstance(v, TickStream) else v)
            for k, v in kw.items()
        }
        out = f(keyed, *args, **kw2)
        odf = out.df.select(
            F.substring_index(KEY, _IDX_SEP, 1).alias(KEY),
            TS, SEQ,
            F.substring_index(KEY, _IDX_SEP, -1).cast("int").alias("__i"),
            F.col(out.value_col).alias(VALUE),
        )
        regrouped = (
            odf.groupBy(KEY, TS, SEQ)
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("__i", VALUE))),
                    lambda s: s[VALUE],
                ).alias(VALUE)
            )
        )
        return TickStream(regrouped)

    return wrapper


def _ambient_start():
    """The enclosing csp.run's starttime, when wiring inside one —
    time-based min_window gates anchor at ENGINE start in the
    reference (stats.py:143-146 csp.const(True, delay=min_window)),
    not at the first data row."""
    try:
        from ..plans.runtime import engine_start_time

        return engine_start_time()
    except Exception:
        return None


def _roll(x, interval, kw, weights=None) -> Rolling:
    return Rolling(
        x,
        interval=interval,
        min_window=kw.pop("min_window", None),
        min_data_points=kw.pop("min_data_points", 0),
        ignore_na=kw.pop("ignore_na", True),
        trigger=kw.pop("trigger", None),
        sampler=kw.pop("sampler", None),
        reset=kw.pop("reset", None),
        start_time=kw.pop("start_time", None) or _ambient_start(),
        weights=weights,
    )


def _done(kw: dict, fn: str) -> None:
    kw.pop("recalc", None)  # no incremental drift to flush (module doc)
    if kw:
        raise TypeError(f"stats.{fn}() got unexpected options {sorted(kw)}")


def ema(
    x: TickStream,
    alpha=None, span=None, com=None, halflife=None,
    adjust: bool = True, ignore_na: bool = False, horizon=None,
    trigger: TickStream | None = None,
    reset: TickStream | None = None,
    sampler: TickStream | None = None,
    min_data_points: int = 0,
    **kw,
) -> TickStream:
    """csp.stats.ema with the reference's GATING options
    (csp/stats.py:2910-3006): ``trigger`` emits the current EMA at
    trigger ticks (NaN while the window holds < ``min_data_points``
    observations or none since the last ``reset``), ``reset`` starts a
    fresh EMA epoch, ``sampler`` makes the observation clock explicit.
    The ungated form delegates straight to the kernel (ema.py).

    Shape: epochs re-key the stream (key ⊕ reset-count), the existing
    per-key EMA kernels run unchanged per epoch, and trigger/NaN
    gating is one aligned last-value window — all plan-side."""
    kw.pop("recalc", None)
    _done(kw, "ema")
    from ..core.align import _ticked, align
    from ..core.ticks import KEY, SEQ, TS, VALUE

    if sampler is not None:
        from ..core.align import sample

        x = sample(sampler, x)
    plain = _ema_kernel(
        x, alpha=alpha, span=span, com=com, halflife=halflife,
        adjust=adjust, ignore_na=ignore_na, horizon=horizon,
    )
    if trigger is None and reset is None and min_data_points <= 1:
        return plain

    from pyspark.sql import Window as W

    streams = {"__x": x}
    if reset is not None:
        streams["__r"] = reset
    if trigger is not None:
        streams["__t"] = trigger
    a = align(streams, keep_ticked=True)
    wcum = W.partitionBy(KEY).orderBy(TS, SEQ).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    epoch = (
        F.sum(F.col(_ticked("__r")).cast("long")).over(wcum)
        if reset is not None else F.lit(0)
    )
    a = a.withColumn("__epoch", epoch)

    if reset is not None:
        # EMA per epoch: run the unchanged kernel on a re-keyed stream
        obs = a.filter(F.col(_ticked("__x"))).select(
            F.concat_ws("\x1f", KEY, F.col("__epoch")).alias(KEY),
            TS, SEQ, F.col("__x").alias(VALUE),
        )
        seg = _ema_kernel(
            TickStream(obs), alpha=alpha, span=span, com=com,
            halflife=halflife, adjust=adjust, ignore_na=ignore_na,
            horizon=horizon,
        )
        ev = seg.df.select(
            F.substring_index(KEY, "\x1f", 1).alias(KEY),
            TS, SEQ, F.col(seg.value_col).alias("__ema"),
        )
    else:
        ev = plain.df.select(
            KEY, TS, SEQ, F.col(plain.value_col).alias("__ema")
        )
    j = a.join(ev, [KEY, TS, SEQ], "left")

    # per-epoch observation count + last EMA, carried forward
    obs_n = F.sum(
        F.col(_ticked("__x")).cast("long")
    ).over(W.partitionBy(KEY, "__epoch").orderBy(TS, SEQ).rowsBetween(
        W.unboundedPreceding, W.currentRow
    ))
    j = j.withColumn("__n", obs_n).withColumn(
        "__last", F.last("__ema", ignorenulls=True).over(
            W.partitionBy(KEY, "__epoch").orderBy(TS, SEQ).rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        )
    )
    # NB: max/min in this module are the STATS functions (builtins
    # shadowed — reference names), so spell the scalar clamp out
    need = min_data_points if min_data_points > 1 else 1
    val = F.when(
        (F.col("__n") >= need) & F.col("__last").isNotNull(),
        F.col("__last"),
    ).otherwise(F.lit(float("nan")))
    out_rows = (
        j.filter(F.col(_ticked("__t"))) if trigger is not None
        else j.filter(F.col(_ticked("__x")))
    )
    return TickStream(out_rows.select(KEY, TS, SEQ, val.alias(VALUE)))


def count(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "count")
    return r.count()


def unique(x: TickStream, interval=None, precision: int = 10, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "unique")
    return r._emit(r.unique_col(precision))


def first(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "first")
    return r.first()


def last(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "last")
    return r.last()


def sum(x: TickStream, interval=None, precise: bool = False,
        weights: TickStream | None = None, **kw) -> TickStream:
    # precise=True selects the reference's Kahan kernel; Spark's sums
    # are already compensated per-partition, so both map to sum_col
    r = _roll(x, interval, kw, weights); _done(kw, "sum")
    return r.wsum() if weights is not None else r.sum()


def mean(x: TickStream, interval=None,
         weights: TickStream | None = None, **kw) -> TickStream:
    r = _roll(x, interval, kw, weights); _done(kw, "mean")
    return r.wmean() if weights is not None else r.mean()


def prod(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "prod")
    return r.prod()


def gmean(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "gmean")
    return r.gmean()


def min(x: TickStream, interval=None, **kw) -> TickStream:  # noqa: A001
    r = _roll(x, interval, kw); _done(kw, "min")
    return r.min()


def max(x: TickStream, interval=None, **kw) -> TickStream:  # noqa: A001
    r = _roll(x, interval, kw); _done(kw, "max")
    return r.max()


def min_max(x: TickStream, interval=None, **kw) -> TickStream:
    """Both extremes in one pass — value is a (min, max) struct
    (reference returns the pair from one monotonic-deque kernel)."""
    r = _roll(x, interval, kw); _done(kw, "min_max")
    return r._emit(
        F.struct(r.min_col().alias("min"), r.max_col().alias("max"))
    )


def quantile(x: TickStream, interval=None, quant: float = 0.5,
             interpolation: str = "linear", **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "quantile")
    return r.quantile(quant, interpolation)


def median(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "median")
    return r.median()


def rank(x: TickStream, interval=None, method: str = "min",
         na_option: str = "keep", **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "rank")
    return r.rank(method, na_option)


def argmax(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "argmax")
    return r.argmax()


def argmin(x: TickStream, interval=None, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "argmin")
    return r.argmin()


def var(x: TickStream, interval=None, ddof: int = 1,
        weights: TickStream | None = None, **kw) -> TickStream:
    r = _roll(x, interval, kw, weights); _done(kw, "var")
    return r.wvar(ddof) if weights is not None else r.var(ddof)


def stddev(x: TickStream, interval=None, ddof: int = 1,
           weights: TickStream | None = None, **kw) -> TickStream:
    r = _roll(x, interval, kw, weights); _done(kw, "stddev")
    return r.wstddev(ddof) if weights is not None else r.stddev(ddof)


def sem(x: TickStream, interval=None, ddof: int = 1,
        weights: TickStream | None = None, **kw) -> TickStream:
    r = _roll(x, interval, kw, weights); _done(kw, "sem")
    return r.wsem(ddof) if weights is not None else r.sem(ddof)


def skew(x: TickStream, interval=None, bias: bool = False, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "skew")
    return r.skew(bias)


def kurt(x: TickStream, interval=None, excess: bool = True,
         bias: bool = False, **kw) -> TickStream:
    r = _roll(x, interval, kw); _done(kw, "kurt")
    return r.kurt(excess, bias)


def cov(x: TickStream, y: TickStream, interval=None,
        min_window=None, ddof: int = 1, min_data_points: int = 0,
        **kw) -> TickStream:
    _done(kw, "cov")
    return RollingPair(
        x, y, interval=interval, min_window=min_window,
        min_data_points=min_data_points,
    ).cov(ddof)


def corr(x: TickStream, y: TickStream, interval=None,
         min_window=None, min_data_points: int = 0, **kw) -> TickStream:
    _done(kw, "corr")
    return RollingPair(
        x, y, interval=interval, min_window=min_window,
        min_data_points=min_data_points,
    ).corr()


def cross_sectional(x: TickStream, interval=None,
                    as_numpy: bool = False, **kw) -> TickStream:
    # as_numpy is representation-only in the reference (list vs array);
    # the value is an ArrayType column either way here
    r = _roll(x, interval, kw); _done(kw, "cross_sectional")
    return r.cross_sectional()


def list_to_numpy(x, fillna: bool = False, **_kw: Any) -> TickStream:
    """Reference csp.stats.list_to_numpy (stats.py:196): a LIST BASKET
    of float edges → one array edge ticking on any input's cycle;
    unticked elements hold their previous value when ``fillna`` else
    read NaN. A single ts[List[float]] edge passes through (both are
    ArrayType columns in the tick table)."""
    if isinstance(x, TickStream):
        return x
    from pyspark.sql import functions as F

    from ..operators.baselib import struct_collectts, struct_fromts

    fields = {f"__e{i}": s for i, s in enumerate(x)}
    s = struct_fromts(fields) if fillna else struct_collectts(fields)
    arr = F.array(*[
        F.coalesce(
            F.col(f"{s.value_col}.__e{i}").cast("double"),
            F.lit(float("nan")),
        )
        for i in range(len(fields))
    ])
    return s.with_df(
        s.df.withColumn(s.value_col, arr), s.value_col
    )


def numpy_to_list(x: TickStream, n: int | None = None, **_kw: Any):
    """Reference csp.stats.numpy_to_list (stats.py:208): one np-array
    edge → a LIST BASKET of ``n`` scalar float edges (element i ticks
    with x[i] on every tick of x). Without ``n`` this is the legacy
    identity form (array edges already ride as ArrayType)."""
    if n is None:
        return x
    from pyspark.sql import functions as F

    return [
        x.with_df(
            x.df.withColumn(
                x.value_col, F.col(x.value_col)[i].cast("double")
            ),
            x.value_col,
        )
        for i in range(n)
    ]


def cov_matrix(x: TickStream, interval=None, ddof: int = 1, **kw):
    """Reference csp.stats.cov_matrix (stats.py:2337): the reference
    consumes one np-array edge and emits a matrix per tick; the
    Spark-first form consumes the LONG-format tick table (series =
    key column) and returns matrix ENTRIES — (key_a, key_b, cov)
    for the full window, or (key_a, key_b, ts, seq, cov) per tick
    when ``interval`` is given (matrix.py; SURVEY §2.5). Pairs
    parallelize over the cluster instead of vectorizing per row."""
    from .matrix import cov_matrix as _full, rolling_cov_matrix as _roll_m

    kw.pop("recalc", None)
    kw.pop("ignore_na", None)  # pair frame drops non-coincident rows
    if kw:
        raise TypeError(
            f"stats.cov_matrix() got unexpected options {sorted(kw)}"
        )
    if interval is None:
        return _full(x, ddof=ddof)
    return _roll_m(x, interval, ddof=ddof)


def _corr_matrix_array(
    x: TickStream, interval, min_window=None, trigger=None
) -> TickStream:
    """corr_matrix over an np-array EDGE (the reference's native form,
    stats.py:2694): element indices are the series; emits one
    array<array<double>> matrix per output tick. Pairs stay within the
    original key; rolling correlation per (key, i, j) windows by
    event time; ``trigger`` samples the latest matrix, ``min_window``
    NaN-gates from the ambient engine start."""
    from pyspark.sql import Window as W

    from ..core.align import _ticked, align
    from ..core.ticks import KEY, SEQ, TS, VALUE

    e = x.df.select(
        KEY, TS, SEQ, F.posexplode(x.value_col).alias("__i", "__v")
    )
    a = e.alias("a")
    b = e.select(KEY, TS, SEQ, F.col("__i").alias("__j"),
                 F.col("__v").alias("__w")).alias("b")
    p = a.join(b, [KEY, TS, SEQ]).filter(F.col("__i") <= F.col("__j"))
    p = p.withColumn("__tsu", F.unix_micros(F.col(TS)))
    if isinstance(interval, int):
        w = W.partitionBy(KEY, "__i", "__j").orderBy(TS, SEQ).rowsBetween(
            -(interval - 1), 0
        )
    else:
        from .rolling import causal_time_window

        us = (interval // _dt.timedelta(microseconds=1))
        tw, (lo, hi) = causal_time_window([KEY, "__i", "__j"], [SEQ], us)
        p = p.withColumn("__tw", tw)
        w = W.partitionBy(KEY, "__i", "__j").orderBy("__tw").rangeBetween(
            lo, hi
        )
    p = p.select(
        KEY, TS, SEQ, "__i", "__j",
        F.corr("__v", "__w").over(w).alias("__c"),
    )
    n = F.max("__j").over(W.partitionBy(KEY)) + 1
    ent = F.sort_array(F.collect_list(F.struct(
        (F.col("__i") * F.lit(1_000_000) + F.col("__j")).alias("k"), "__c"
    )))
    per_tick = (
        p.withColumn("__n", n)
        .groupBy(KEY, TS, SEQ)
        .agg(
            F.map_from_entries(
                F.flatten(F.array(
                    ent,
                    # mirror of the strict upper triangle (the diagonal
                    # must not duplicate its map key)
                    F.sort_array(F.collect_list(F.when(
                        F.col("__i") != F.col("__j"),
                        F.struct(
                            (F.col("__j") * F.lit(1_000_000) + F.col("__i"))
                            .alias("k"), "__c"
                        ),
                    ))),
                ))
            ).alias("__m"),
            F.first("__n").alias("__n"),
        )
    )
    nan = F.lit(float("nan"))
    mat = F.transform(
        F.sequence(F.lit(0), F.col("__n") - 1),
        lambda i: F.transform(
            F.sequence(F.lit(0), F.col("__n") - 1),
            lambda j: F.coalesce(
                F.element_at(F.col("__m"), i * 1_000_000 + j), nan
            ),
        ),
    )
    ticks = TickStream(per_tick.select(KEY, TS, SEQ, mat.alias(VALUE)))
    if trigger is None and min_window is None:
        return ticks
    streams = {"__x": ticks}
    if trigger is not None:
        streams["__t"] = trigger
    al = align(streams, keep_ticked=True)
    val = F.col("__x")
    if min_window is not None:
        start = _ambient_start()
        anchor = (
            F.unix_micros(F.lit(start).cast("timestamp"))
            if start is not None
            else F.min(F.unix_micros(F.col(TS))).over(W.partitionBy(KEY))
        )
        warm = F.unix_micros(F.col(TS)) >= anchor + (
            min_window // _dt.timedelta(microseconds=1)
        )
        # below min_window (or no data yet): all-NaN matrix of dim n
        dim = F.max(F.size("__x")).over(W.partitionBy(KEY))
        nan_row = F.transform(F.sequence(F.lit(1), dim), lambda _: nan)
        nan_mat = F.transform(F.sequence(F.lit(1), dim), lambda _: nan_row)
        val = F.when(warm & val.isNotNull(), val).otherwise(nan_mat)
    out = al.filter(
        F.col(_ticked("__t")) if trigger is not None
        else F.col(_ticked("__x"))
    )
    return TickStream(out.select(KEY, TS, SEQ, val.alias(VALUE)))


def corr_matrix(x: TickStream, interval=None, **kw):
    """Reference csp.stats.corr_matrix (stats.py:2694) — np-array
    edges emit a matrix per tick (_corr_matrix_array, incl. trigger/
    min_window gating); LONG-format tick tables return matrix entries
    (see cov_matrix). Rolling form derives each pair correlation from
    the rolling covariance with ddof=0 normalization cancelling in
    the ratio."""
    from pyspark.sql import Window

    from ..core.ticks import SEQ, TS
    from .matrix import _pairs, corr_matrix as _full

    kw.pop("recalc", None)
    kw.pop("ignore_na", None)
    if _is_array_stream(x):
        return _corr_matrix_array(
            x, interval,
            min_window=kw.pop("min_window", None),
            trigger=kw.pop("trigger", None),
        )
    if kw:
        raise TypeError(
            f"stats.corr_matrix() got unexpected options {sorted(kw)}"
        )
    if interval is None:
        return _full(x)
    p = _pairs(x)
    if isinstance(interval, int):
        w = (
            Window.partitionBy("key_a", "key_b")
            .orderBy(TS, SEQ)
            .rowsBetween(-(interval - 1), 0)
        )
    else:
        from .rolling import causal_time_window

        us = (interval // _dt.timedelta(microseconds=1))
        p = p.withColumn("__tsu", F.unix_micros(F.col(TS)))
        tw, (lo, hi) = causal_time_window(["key_a", "key_b"], [SEQ], us)
        p = p.withColumn("__tw", tw)
        w = (
            Window.partitionBy("key_a", "key_b")
            .orderBy("__tw")
            .rangeBetween(lo, hi)
        )
    return p.select(
        "key_a", "key_b", TS, SEQ,
        F.corr("va", "vb").over(w).alias("corr"),
    )


# np-array edges compute ELEMENTWISE through the unchanged scalar
# kernels (_arraywise): applied to every single-input statistic, so
# reference numpy-stats code (csp/stats.py np kernels) is source-
# portable. Pairwise/matrix forms handle arrays themselves.
for _n in (
    "count", "unique", "first", "last", "sum", "mean", "prod", "gmean",
    "min", "max", "quantile", "median", "rank", "argmax", "argmin",
    "var", "stddev", "sem", "skew", "kurt", "ema",
):
    globals()[_n] = _arraywise(globals()[_n])
del _n
