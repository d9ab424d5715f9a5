"""Bucketed / partitioned storage layouts for repeated big joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle. If a
table is written BUCKETED on its join key, Spark records the hash
layout in the catalog and a join between two tables bucketed the same
way runs with NO exchange on either side — the co-location is paid
once at write time and amortized over every subsequent join/aggregate
on that key (the classic warehouse layout contract; Spark's bucketed
scan elimination).

These helpers wrap the saveAsTable bucketBy path (bucketing metadata
lives in the catalog, so plain .parquet() cannot express it) and give
the plan-level assertion hook used by the tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: "str | list[str]",
    num_buckets: int = 8,
    sort_by: "str | list[str] | None" = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed on
    ``bucket_by`` (optionally sorted within buckets — enables
    sort-merge joins with neither shuffle NOR sort). Every later join
    or aggregation on the bucket key over tables with the SAME bucket
    count skips its exchange."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).bucketBy(num_buckets, *cols)
    if sort_by is not None:
        s = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*s)
    w.format("parquet").saveAsTable(name)


def save_tick_stream(
    stream,
    name: str,
    num_buckets: int = 256,
    mode: str = "overwrite",
) -> None:
    """Persist a TickStream bucketed by ``key`` and sorted by
    (key, ts, seq): every later per-key window over the stored stream
    — rolling/expanding stats, history buffers, single-stream align
    consumers — runs with ZERO exchange (asserted on the executed
    plan in tests). The engine's dominant per-query cost at 100 TB is
    the key shuffle; this pays it once at write time, the classic
    warehouse trade. The repartition before write yields one file per
    bucket so scans stay wide-row-group and sorted within buckets.

    Note: align() over MULTIPLE streams unions its inputs first, and a
    union of bucketed scans no longer advertises a single hash
    distribution, so the multi-stream union-align still shuffles —
    store pre-aligned frames (or one multi-column stream) when that
    matters."""
    from ..core.ticks import KEY, SEQ, TS

    df = stream.df.repartition(num_buckets, KEY)
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, KEY)
        .sortBy(KEY, TS, SEQ)
        .format("parquet")
        .saveAsTable(name)
    )


def load_tick_stream(spark, name: str, value_col: str | None = None):
    """Read back a save_tick_stream table as a TickStream."""
    from ..core.ticks import TickStream, VALUE

    return TickStream(spark.table(name), value_col or VALUE)


def exchanges_in_plan(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan — the metric a
    bucketed layout is supposed to drive to zero for key-aligned
    joins."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.split("\n")
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    order_col: str,
    rows_per_shard: int = 100_000,
    n_shards: int | None = None,
) -> None:
    """Write a training table as size-balanced, ORDER-PRESERVING
    shards — the dataloader handoff (webdataset/Megatron-style: many
    equal files, each internally sorted by ``order_col`` such as the
    packed sequence id, so workers stream disjoint contiguous ranges).

    Plan: ONE range repartition on ``order_col`` (contiguous,
    balanced via range-partition sampling) + an in-partition sort +
    ``maxRecordsPerFile`` to cap file size. n_shards defaults to
    ceil(count / rows_per_shard) — the count is the only extra job.
    """
    from pyspark.sql import functions as F

    if n_shards is None:
        total = df.count()
        n_shards = max(1, -(-total // rows_per_shard))
    (
        df.repartitionByRange(n_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
        .parquet(path)
    )
