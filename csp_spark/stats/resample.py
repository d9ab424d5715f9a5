"""Time-bucket resampling: OHLC bars over tick streams.

The reference builds bars by wiring ``csp.timer`` triggers into
``csp.stats`` nodes (docs/wiki/how-tos/Use-Statistical-Nodes.md shows
the trigger/sampler pattern; examples wire first/max/min/last per
interval). In the tick-table model a bar is simply a keyed tumbling
bucket: one hash-aggregate, map-side partial, no window function —
the cheapest possible shape at 100 TB (tumbling buckets never overlap,
unlike the per-tick sliding windows of stats/rolling.py).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.ticks import KEY, SEQ, TS, VALUE, TickStream


def ohlc_bars(
    x: TickStream,
    interval: _dt.timedelta,
    origin: _dt.datetime | None = None,
) -> DataFrame:
    """Per-key OHLC bars: one row per (key, bar) with the bar's start
    time, open/high/low/close, tick count, and mean.

    Bars are tumbling ``interval`` buckets of engine time aligned to
    ``origin`` (default: the Unix epoch — deterministic and
    engine-portable, matching the floor-division rule a SQL oracle
    replays). Open/close follow the (ts, seq) engine order exactly:
    open = first value of the bucket, close = last, including
    same-timestamp cycle ordering. Empty buckets produce no row (csp
    emits nothing without ticks; forward-fill joins the previous
    close via align/asof_join if needed).
    """
    if interval <= _dt.timedelta(0):
        raise ValueError("interval must be positive")
    # exact integer microseconds — float total_seconds()*1e6 truncates
    # one µs short for many µs-bearing intervals
    us = interval // _dt.timedelta(microseconds=1)
    if origin is None:
        origin_us = 0
    else:
        origin_us = (
            origin.replace(tzinfo=_dt.timezone.utc)
            - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        ) // _dt.timedelta(microseconds=1)
    t_us = F.unix_micros(F.col(TS).cast("timestamp"))
    bar_idx = F.floor((t_us - F.lit(origin_us)) / F.lit(us))
    bar_start = F.timestamp_micros(
        (bar_idx * F.lit(us) + F.lit(origin_us)).cast("long")
    )
    order = F.struct(F.col(TS), F.col(SEQ))
    v = F.col(x.value_col)
    return (
        x.df.withColumn("__bar", bar_start)
        .groupBy(F.col(KEY), F.col("__bar").alias("bar_start"))
        .agg(
            F.min_by(v, order).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order).alias("close"),
            F.count(v).alias("n_ticks"),
            F.avg(v).alias("mean"),
        )
    )


def sessionize(
    x: TickStream,
    gap: _dt.timedelta,
    out_col: str = "session_idx",
) -> TickStream:
    """Gap-based sessionization: per key, a tick starts a NEW session
    when MORE than ``gap`` elapsed since the key's previous tick — a
    tick at exactly ``last + gap`` still joins, the closed-boundary
    rule of Spark's native session_window (probed: an event at
    last+gap merges, last+gap+1µs splits), so the streaming twin
    matches at exact-boundary ticks too (same-timestamp cycles always
    share a session). Adds ``out_col``
    (0-based session index per key, in engine order) to every tick —
    the classic event-analytics primitive the reference expresses as
    a stateful @csp.node holding last-seen time.

    Plan: ONE shuffle on the key, then two in-partition window passes
    (lag + running sum of boundary flags) — no per-session state on
    the driver, sessions never cross keys so a 10^9-key stream is
    pure parallelism. The streaming twin is Spark's native
    ``F.session_window`` aggregate (streaming/ops.py
    session_ticks_stream)."""
    from pyspark.sql import Window

    if gap <= _dt.timedelta(0):
        raise ValueError("gap must be positive")
    for c in (out_col, "__b"):
        if c in x.df.columns:
            raise ValueError(
                f"sessionize: input already has a column {c!r} — "
                "rename it or pass a different out_col"
            )
    w = Window.partitionBy(KEY).orderBy(TS, SEQ)
    # exact integer microseconds (float total_seconds()*1e6 truncates
    # 1 µs short for many µs-bearing gaps, which would SPLIT a tick at
    # exactly last+gap that native session_window JOINS)
    gap_us = gap // _dt.timedelta(microseconds=1)
    prev = F.lag(F.col(TS)).over(w)
    boundary = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(TS)) - F.unix_micros(prev) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    df = x.df.withColumn("__b", boundary).withColumn(
        out_col,
        F.sum("__b").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) - F.lit(1),
    ).drop("__b")
    return x.with_df(df)


def session_bars(
    x: TickStream,
    gap: _dt.timedelta,
) -> DataFrame:
    """Per-session aggregate over :func:`sessionize`: one row per
    (key, session) with start/end, duration, tick count, first/last
    value, and sum — the session-level rollup (a hash-aggregate over
    the sessionized ticks; same single key shuffle, reused)."""
    s = sessionize(x, gap)
    v = F.col(s.value_col)
    order = F.struct(F.col(TS), F.col(SEQ))
    return (
        s.df.groupBy(F.col(KEY), F.col("session_idx"))
        .agg(
            F.min(F.col(TS)).alias("session_start"),
            F.max(F.col(TS)).alias("session_end"),
            (F.unix_micros(F.max(F.col(TS)))
             - F.unix_micros(F.min(F.col(TS)))).alias("duration_us"),
            F.count(v).alias("n_ticks"),
            F.min_by(v, order).alias("first_v"),
            F.max_by(v, order).alias("last_v"),
            F.sum(v).alias("sum_v"),
        )
    )
