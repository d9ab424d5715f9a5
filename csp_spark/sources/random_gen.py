"""csp.random parity (csp/random.py) — seeded stochastic sources.

Reference: ``poisson_timer(rate, seed)`` emits events with exponential
inter-arrival gaps (csp/random.py:17-46); ``brownian_motion(trigger,
drift, covariance)`` / ``brownian_motion_1d`` sample (geometric)
Brownian paths at trigger ticks (csp/random.py:69-166).

Spark-first: generate with ``spark.range`` + seeded rand/randn columns
and window cumulative sums — fully distributed, no driver loop. Seeded
F.rand/F.randn are deterministic per (seed, partition, row) so results
are reproducible for a fixed partitioning; we pin the range partition
count for exactly that reason.
"""

from __future__ import annotations

import datetime as _dt
import math

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..core.ticks import GLOBAL_KEY, KEY, SEQ, TS, VALUE, TickStream

_NUM_PARTS = 32  # pinned so seeded rand() streams are reproducible


def poisson_timer(
    spark: SparkSession,
    rate: float,
    start: _dt.datetime,
    end: _dt.datetime,
    seed: int = 42,
    key: str = GLOBAL_KEY,
) -> TickStream:
    """Poisson-process event times in [start, end] at ``rate`` events/sec
    (csp/random.py:17-46). Gap_i = -ln(U_i)/rate; event time is the
    running sum of gaps. Over-generates by 4*sigma then filters to end,
    so the expected-count shortfall probability is negligible."""
    horizon = (end - start).total_seconds()
    n = max(int(rate * horizon + 4 * math.sqrt(rate * horizon)) + 1, 8)
    w = Window.orderBy("id")
    gaps = spark.range(0, n, 1, _NUM_PARTS).withColumn(
        "gap", -F.log(F.rand(seed)) / F.lit(rate)
    )
    times = gaps.withColumn("t", F.sum("gap").over(w))
    out = (
        times.filter(F.col("t") <= horizon)
        .select(
            F.lit(key).alias(KEY),
            F.timestamp_micros(
                F.unix_micros(F.lit(start)) + (F.col("t") * 1e6).cast("long")
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
    dt seconds ~ N(drift*dt, vol^2*dt); the path is the windowed
    cumulative sum — csp integrates the same SDE per trigger tick.
    ``geometric=True`` exponentiates (GBM: x0*exp(path))."""
    w = TickStream.order_window()
    df = trigger.df.select(KEY, TS, SEQ)
    dt_s = (
        F.unix_micros(F.col(TS))
        - F.unix_micros(F.lag(F.col(TS)).over(w))
    ) / 1e6
    df = df.withColumn("__dt", F.coalesce(dt_s, F.lit(0.0)))
    incr = F.lit(drift) * F.col("__dt") + F.lit(vol) * F.sqrt(
        F.col("__dt")
    ) * F.randn(seed)
    df = df.withColumn("__incr", incr)
    path = F.sum("__incr").over(w)
    value = (
        F.lit(x0) * F.exp(path) if geometric else F.lit(x0) + path
    )
    return TickStream(df.select(KEY, TS, SEQ, value.alias(VALUE)))
