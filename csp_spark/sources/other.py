"""Non-parquet input adapters (SURVEY.md §2.1).

Reference surface: CSVReader.subscribe (csp/adapters/csv.py:29-113),
DBReader.subscribe (csp/adapters/db.py:36-440), RecordBatchPull
(csp/adapters/arrow.py:59-90), KafkaAdapterManager.subscribe
(csp/adapters/kafka.py:39-191). Each reference adapter replays a
timestamped source into the engine ordered by its time column; our
analog reads the source with the native Spark connector and adapts it
into the tick encoding (ordering is carried by (ts, seq), not by
replay — SURVEY.md §2.8).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.ticks import TickStream


def _window(df: DataFrame, ts_col: str, start, end) -> DataFrame:
    if start is not None:
        df = df.filter(F.col(ts_col) >= F.lit(start))
    if end is not None:
        df = df.filter(F.col(ts_col) <= F.lit(end))
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    ts_col: str,
    value_col: str,
    schema: str | None = None,
    key_col: str | None = None,
    start: _dt.datetime | None = None,
    end: _dt.datetime | None = None,
    header: bool = True,
    **options: Any,
) -> TickStream:
    """CSVReader.subscribe parity (csp/adapters/csv.py:29-113): CSV
    replay with explicit schema (inferSchema is a full extra pass —
    avoid at scale) and start/end window pushed into the scan."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = _window(reader.csv(path), ts_col, start, end)
    return TickStream.from_table(df, ts_col=ts_col, value_col=value_col, key_col=key_col)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    ts_col: str,
    value_col: str,
    key_col: str | None = None,
    start: _dt.datetime | None = None,
    end: _dt.datetime | None = None,
    num_partitions: int = 8,
    **options: Any,
) -> TickStream:
    """DBReader.subscribe parity (csp/adapters/db.py:36-440) on
    spark.read.jdbc. Partitioned reads on the time column so a large
    table scan parallelizes; requires a JDBC driver on the classpath
    (none is shipped in this container — structural parity only)."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if start is not None and end is not None:
        # partition the scan along the replay window
        reader = (
            reader.option("partitionColumn", ts_col)
            .option("lowerBound", start.isoformat(sep=" "))
            .option("upperBound", end.isoformat(sep=" "))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = _window(reader.load(), ts_col, start, end)
    return TickStream.from_table(df, ts_col=ts_col, value_col=value_col, key_col=key_col)


def from_arrow(
    spark: SparkSession,
    data: Any,
    ts_col: str,
    value_col: str,
    key_col: str | None = None,
) -> TickStream:
    """RecordBatchPullInputAdapter parity (csp/adapters/arrow.py:59-90):
    replay an in-memory pyarrow Table / list of RecordBatches."""
    import pyarrow as pa

    if isinstance(data, list):
        data = pa.Table.from_batches(data)
    df = spark.createDataFrame(data)
    return TickStream.from_table(df, ts_col=ts_col, value_col=value_col, key_col=key_col)


def record_batch_pull(
    spark: SparkSession,
    ts_col_name: str,
    source: Any,
    schema: "Any | None" = None,
    value_col: str | None = None,
    key_col: str | None = None,
) -> TickStream:
    """RecordBatchPullInputAdapter / CRecordBatchPullInputAdapter parity
    (csp/adapters/arrow.py:26-90): pull an iterator/generator of Arrow
    record batches — or PyCapsule-interface objects exposing
    ``__arrow_c_array__`` (the C Data path the reference's C adapter
    takes) — into one TickStream ordered by ``ts_col_name``.

    Spark mapping: the batches are concatenated into one Arrow table
    (zero-copy column stitch) and handed to ``createDataFrame``, which
    ships Arrow IPC straight to the JVM; ordering comes from the
    (ts, seq) encoding, so the reference's "caller must pre-sort"
    contract is NOT required here. For sources too large to
    materialize, write them to parquet and use sources.parquet
    (the reference adapter is an in-memory replay tool; so is this).

    ``value_col=None`` keeps ALL non-ts columns as a struct value (the
    multi-column subscribe shape); naming one column gives the scalar
    stream form.
    """
    import pyarrow as pa

    batches = []
    for item in source:
        if isinstance(item, pa.RecordBatch):
            batches.append(item)
        elif isinstance(item, tuple):
            # raw __arrow_c_array__() output: (schema_capsule, array_capsule)
            class _C:
                def __init__(self, tup):
                    self._t = tup

                def __arrow_c_array__(self, requested_schema=None):
                    return self._t

            batches.append(pa.record_batch(_C(item)))
        else:  # any PyCapsule-interface object
            batches.append(pa.record_batch(item))
    if not batches:
        if schema is None:
            raise ValueError("empty source requires an explicit schema")
        tbl = pa.Table.from_pylist([], schema=schema)
    else:
        tbl = pa.Table.from_batches(batches)
    df = spark.createDataFrame(tbl)
    if value_col is None:
        others = [c for c in df.columns if c not in (ts_col_name, key_col)]
        if len(others) == 1:
            value_col = others[0]
        else:
            df = df.select(
                *( [key_col] if key_col else [] ),
                ts_col_name,
                F.struct(*others).alias("value"),
            )
            value_col = "value"
    return TickStream.from_table(
        df, ts_col=ts_col_name, value_col=value_col, key_col=key_col
    )


def record_batches_to_struct(
    spark: SparkSession,
    data: Any,
    cls: type,
    ts_col: str,
    field_map: "dict[str, str] | None" = None,
    key_col: str | None = None,
) -> TickStream:
    """record_batches_to_struct parity (csp/adapters/arrow.py:209-260):
    Arrow record batches in, a TickStream of typed ``cls`` Struct
    values out. ``field_map`` maps struct field -> arrow column (the
    reference's orientation); unmapped fields land NULL (csp's unset).
    The cast to ``cls.spark_type()`` happens column-wise in the plan —
    no Python per-row work."""
    import pyarrow as pa

    from ..core.record import Struct

    if not (isinstance(cls, type) and issubclass(cls, Struct)):
        raise TypeError(f"cls must be a csp_spark Struct subclass, got {cls}")
    if isinstance(data, list):
        data = pa.Table.from_batches(data)
    df = spark.createDataFrame(data)
    field_map = field_map or {f: f for f in cls.fields()}
    styp = cls.spark_type()
    cols = []
    for f in styp.fieldNames():
        src = field_map.get(f)
        if src is not None and src in df.columns:
            cols.append(F.col(src).cast(styp[f].dataType).alias(f))
        else:
            cols.append(F.lit(None).cast(styp[f].dataType).alias(f))
    out = df.select(
        *( [key_col] if key_col else [] ),
        ts_col,
        F.struct(*cols).alias("value"),
    )
    return TickStream.from_table(out, ts_col=ts_col, value_col="value", key_col=key_col)


class PullInputAdapter:
    """User pull-adapter authoring base (reference
    csp/impl/pulladapter.py:10-44): subclass with ``next()`` returning
    ``(datetime, value)`` tuples or None when exhausted; optional
    ``start(start_time, end_time)`` / ``stop()`` lifecycle hooks.
    Drive it through :func:`from_pull_adapter`."""

    def __init__(self):
        import datetime as _dtm

        self._start_time = _dtm.datetime.min
        self._end_time = _dtm.datetime.max

    def start(self, start_time, end_time):
        self._start_time = start_time
        self._end_time = end_time

    def stop(self):
        pass

    def next(self):
        raise NotImplementedError


def from_pull_adapter(
    spark: SparkSession,
    adapter: PullInputAdapter,
    start: "_dt.datetime | None" = None,
    end: "_dt.datetime | None" = None,
    key: str = "",
    value_schema: str = "double",
    max_ticks: int = 10_000_000,
) -> TickStream:
    """py_pull_adapter_def parity (csp/impl/wiring/adapters.py): run a
    user PullInputAdapter's ``next()`` loop to exhaustion and replay
    the ticks as a TickStream.

    The drain happens ON THE DRIVER, exactly like the reference engine
    (a pull adapter is a single-threaded replay source on the engine
    thread) — it suits bounded hand-authored sources (curves, test
    fixtures, API paginators). Bulk data belongs in the parquet/arrow
    sources, which scan distributed. ``max_ticks`` guards a next()
    that never returns None.
    """
    import datetime as _dtm

    from ..core.ticks import GLOBAL_KEY

    adapter.start(
        start if start is not None else _dtm.datetime.min,
        end if end is not None else _dtm.datetime.max,
    )
    rows = []
    try:
        pulled = 0
        while True:
            nxt = adapter.next()
            if nxt is None:
                break
            pulled += 1
            if pulled > max_ticks:  # strictly MORE than max_ticks pulls
                raise RuntimeError(
                    f"pull adapter exceeded max_ticks={max_ticks}"
                )
            ts, v = nxt
            if start is not None and ts < start:
                continue
            if end is not None and ts > end:
                break
            rows.append((key or GLOBAL_KEY, ts, pulled - 1, v))
    finally:
        adapter.stop()
    df = spark.createDataFrame(
        rows, f"key string, ts timestamp, seq long, value {value_schema}"
    )
    return TickStream(df)


def py_pull_adapter_def(name: str, adapterimpl: type, out_type=None, **defaults):
    """Reference py_pull_adapter_def calling convention
    (csp/impl/wiring/adapters.py): returns a factory. Two accepted
    declaration styles:

    - explicit: ``py_pull_adapter_def('A', Impl, "double",
      interval=timedelta(1))`` — kwargs are default VALUES, the
      factory is called ``A(spark, start=..., **impl_kwargs)``;
    - REFERENCE: ``py_pull_adapter_def('A', Impl, ts[int],
      interval=timedelta, num_ticks=int)`` — kwargs whose values are
      TYPES declare the impl's parameters (and their order for
      positional calls), out_type is a ts[...] marker, and the factory
      is called like the reference — ``A(timedelta(seconds=1.5),
      num_ticks=10)`` — with spark/start/end resolved from the ambient
      session and csp.run bounds.
    """
    declared = [k for k, v in defaults.items() if isinstance(v, type)]
    value_defaults = {
        k: v for k, v in defaults.items() if not isinstance(v, type)
    }
    if out_type is not None and not isinstance(out_type, str):
        from ..core.nodeparse import _elem_type

        out_type = _elem_type(out_type)

    def factory(*args, **kwargs) -> TickStream:
        from pyspark.sql import SparkSession

        args = list(args)
        if args and isinstance(args[0], SparkSession):
            spark = args.pop(0)
        else:
            from ..core.session import get_spark

            spark = get_spark()
        start = kwargs.pop("start", None)
        end = kwargs.pop("end", None)
        if start is None or end is None:
            try:
                from ..plans.runtime import engine_end_time, engine_start_time

                start = start or engine_start_time()
                end = end or engine_end_time()
            except Exception:
                pass
        key = kwargs.pop("key", "")
        merged = dict(value_defaults)
        # positional impl args map onto the declared parameter order
        for pname, val in zip(declared, args):
            merged[pname] = val
        merged.update(kwargs)
        return from_pull_adapter(
            spark,
            adapterimpl(**merged),
            start=start,
            end=end,
            key=key,
            value_schema=out_type or "double",
        )

    factory.__name__ = name
    return factory


class AdapterManager:
    """User sim adapter-MANAGER authoring (reference
    csp/impl/adaptermanager.py:7-25 AdapterManagerImpl +
    ManagedSimInputAdapter): one manager owns an external source and
    feeds several named input channels; the engine walks its
    timeslices in order.

    Spark mapping: subclass ``timeslices()`` yielding
    ``(datetime, channel, key, value)`` tuples (the analog of
    process_next_sim_timeslice pushing onto adapter inputs). The
    manager drains ONCE into a single replay table; ``subscribe``
    hands out per-channel TickStreams as filters sharing that scan —
    the same one-source/many-subscriptions shape the reference
    manager provides, with start/stop lifecycle preserved.
    ``max_ticks`` guards runaway generators; bulk sources belong on
    the native scan adapters.
    """

    def __init__(self, spark: SparkSession, value_schema: str = "double",
                 max_ticks: int = 10_000_000):
        self.spark = spark
        self.value_schema = value_schema
        self.max_ticks = max_ticks
        self._table = None

    def start(self, start_time=None, end_time=None):
        """Connect to the external source (optional override)."""

    def stop(self):
        """Disconnect (optional override)."""

    def timeslices(self):
        """Yield (datetime, channel, key, value) in time order."""
        raise NotImplementedError

    def _build(self) -> DataFrame:
        if self._table is None:
            self.start()
            rows = []
            try:
                for i, (ts, channel, key, value) in enumerate(self.timeslices()):
                    if i >= self.max_ticks:
                        raise RuntimeError(
                            f"adapter manager exceeded max_ticks={self.max_ticks}"
                        )
                    rows.append((str(channel), str(key), ts, i, value))
            finally:
                self.stop()
            self._table = self.spark.createDataFrame(
                rows,
                f"__channel string, key string, ts timestamp, seq long, "
                f"value {self.value_schema}",
            )
        return self._table

    def subscribe(self, channel: str) -> TickStream:
        """One channel's stream — a filter over the shared replay table
        (reference: each ManagedSimInputAdapter subscribed to the
        manager)."""
        df = self._build().filter(F.col("__channel") == channel).drop("__channel")
        return TickStream(df)
