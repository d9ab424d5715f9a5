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
    us = int(interval.total_seconds() * 1_000_000)
    if origin is None:
        origin_us = 0
    else:
        origin_us = int(origin.replace(tzinfo=_dt.timezone.utc).timestamp() * 1e6)
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
