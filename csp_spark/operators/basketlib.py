"""Basket operators (SURVEY.md §2.3 bottom rows).

Reference: csp/basketlib.py — ``sync(x, threshold, output_incomplete)``
(basketlib.py:14-65; C++ basketlibimpl.cpp:7) waits up to ``threshold``
for every basket member to tick and emits one synchronized batch;
``sample_basket(trigger, x)`` (basketlib.py:68-94; basketlibimpl.cpp:85)
snapshots the valid members at trigger ticks.

Spark mapping: a basket is a dict of named TickStreams. ``sync``
becomes tumbling threshold buckets (floor(epoch/threshold)) with
first-tick-per-member — the batch analog of "open a window at the
first tick, close after threshold" (deterministic, replay-exact);
``sample_basket`` is the align/as-of kernel with a struct projection.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Mapping

from pyspark.sql import functions as F

from ..core.align import align
from ..core.ticks import KEY, SEQ, TS, VALUE, TickStream


def sync(
    streams: Mapping[str, TickStream],
    threshold: _dt.timedelta,
    output_incomplete: bool = False,
) -> TickStream:
    """Synchronized batches: one tick per (key, threshold-bucket)
    carrying a struct of each member's FIRST value in the bucket; the
    tick time is the latest of those firsts (when the batch became
    complete). ``output_incomplete=False`` drops buckets where some
    member never ticked (reference default behavior)."""
    us = int(threshold.total_seconds() * 1e6)
    members = list(streams)
    tagged = None
    for name, s in streams.items():
        part = s.df.select(
            KEY, TS, SEQ,
            F.lit(name).alias("__member"),
            F.col(s.value_col).cast("double").alias("__v"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    bucket = (F.unix_micros(F.col(TS)) / us).cast("long").alias("__bucket")
    firsts = (
        tagged.withColumn("__bucket", bucket)
        .groupBy(KEY, "__bucket", "__member")
        .agg(
            F.min_by(F.col("__v"), F.struct(TS, SEQ)).alias("__v"),
            F.min(F.struct(TS, SEQ)).alias("__at"),
        )
    )
    batch = firsts.groupBy(KEY, "__bucket").agg(
        F.max(F.col("__at." + TS)).alias(TS),
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct(F.col("__member"), F.col("__v")))
            )
        ).alias(VALUE),
        F.count(F.lit(1)).alias("__n"),
    )
    if not output_incomplete:
        batch = batch.filter(F.col("__n") == len(members))
    out = batch.select(KEY, TS, F.lit(0).cast("long").alias(SEQ), VALUE)
    return TickStream(out)


def sample_basket(
    trigger: TickStream, streams: Mapping[str, TickStream]
) -> TickStream:
    """Snapshot the last value of every valid member at each trigger
    tick (basketlib.py:68-94): align trigger + members, emit rows at
    trigger ticks with a struct of the members' last values (NULL =
    not yet valid, csp skips unset members — we carry NULL so the
    struct shape is static for Spark)."""
    named = {"__trigger": trigger}
    named.update(streams)
    wide = align(named, keep_ticked=True)
    out = wide.filter(F.col("__trigger__ticked")).select(
        KEY, TS, SEQ,
        F.struct(*[F.col(n).alias(n) for n in streams]).alias(VALUE),
    )
    return TickStream(out)
