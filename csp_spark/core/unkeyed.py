"""Scalable running aggregates over UNKEYED (GLOBAL_KEY) streams.

The align/window engine partitions by key, so keyed streams scale by
adding keys. An unkeyed stream ordinarily collapses into ONE window
partition (core/align.py scale note) — fine at test scale, a
single-task bottleneck at 100 TB. For ASSOCIATIVE running aggregates
(sum / count / min / max) the collapse is avoidable with the classic
two-pass prefix pattern (parallel prefix-sum / MapReduce "scan"):

1. range-partition the stream by engine order ``(ts, seq)`` and pin
   each row's partition id (persisted — a recompute could reassign
   ids, so the id column is materialized exactly once);
2. one per-partition partial aggregate → a #partitions-row frame; its
   exclusive prefix combine (a window over ≤ thousands of rows — the
   only intentionally-single-partition step, and it is tiny) gives
   each partition its incoming offset;
3. broadcast-join the offsets back and run the within-partition
   running aggregate under ``Window.partitionBy(partition_id)`` —
   embarrassingly parallel, no global window anywhere.

Floating-point note: two-pass grouping changes summation order, so
double sums are combined through DECIMAL(28,10) (exact, associative —
bit-identical to the sequential form and to any engine's replay);
count/min/max are associative exactly.

csp itself executes a single stream sequentially on one thread, so
this is a capability beyond the reference, not a parity item.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .ticks import KEY, SEQ, TS, TickStream

_DEC = "decimal(28,10)"

_AGGS = ("sum", "count", "min", "max")


def running_unkeyed(
    x: TickStream, agg: str = "sum", num_partitions: int | None = None
) -> TickStream:
    """Running ``agg`` over the whole stream in engine order, scalable:
    the plan contains no single-partition window over the data — only
    the #partitions-row offset combine is serial.

    Equivalent to ``accum``/``count``/running min/max on a GLOBAL_KEY
    stream; use this form when one logical stream is too large for one
    task. Output value type: sum → double (via exact DECIMAL), count →
    long, min/max → the input type.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {_AGGS}")
    spark = x.df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    v = F.col(x.value_col)

    base = (
        x.df.select(KEY, TS, SEQ, v.alias("__v"))
        .repartitionByRange(n, TS, SEQ)
        .sortWithinPartitions(TS, SEQ)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    base.count()  # pin the pid assignment before it is read twice

    if agg == "sum":
        part = F.sum(F.col("__v").cast(_DEC))
        within = F.sum(F.col("__v").cast(_DEC))
    elif agg == "count":
        part = F.count(F.col("__v"))
        within = F.count(F.col("__v"))
    elif agg == "min":
        part = F.min("__v")
        within = F.min("__v")
    else:
        part = F.max("__v")
        within = F.max("__v")

    # exclusive prefix of the partials: partition i's offset combines
    # partitions 0..i-1 (NULL for partition 0)
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = base.groupBy("__pid").agg(part.alias("__part")).select(
        "__pid",
        {
            "sum": F.sum("__part"),
            "count": F.sum("__part"),
            "min": F.min("__part"),
            "max": F.max("__part"),
        }[agg].over(woff).alias("__off"),
    )

    wrun = (
        Window.partitionBy("__pid")
        .orderBy(TS, SEQ)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = within.over(wrun)
    if agg == "sum":
        total = (
            run + F.coalesce(F.col("__off"), F.lit(0).cast(_DEC))
        ).cast("double")
    elif agg == "count":
        total = (run + F.coalesce(F.col("__off"), F.lit(0))).cast("long")
    elif agg == "min":
        total = F.least(run, F.coalesce(F.col("__off"), run))
    else:
        total = F.greatest(run, F.coalesce(F.col("__off"), run))

    out = (
        base.join(F.broadcast(offs), "__pid")
        .select(KEY, TS, SEQ, total.alias("value"))
    )
    return TickStream(out)
