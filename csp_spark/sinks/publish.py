"""Output adapters (SURVEY.md §2.2).

Reference surface: ParquetWriter.publish/publish_struct
(csp/adapters/output_adapters/parquet.py:40-220), CSVWriter,
KafkaAdapterManager.publish (csp/adapters/kafka.py:192-240),
csp.print/csp.log (csp/baselib.py:181-274), write_record_batches
(csp/adapters/arrow.py:104-155), add_graph_output
(csp/impl/wiring/runtime.py:86-87).

Spark-first: batch sinks are DataFrameWriter calls; streaming sinks are
writeStream with the matching format. Partitioning: time-bucketed
(date) partitions by default so a 100 TB history lands as prunable
partitions rather than one directory of files.
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.ticks import KEY, SEQ, TS, VALUE, TickStream

logger = logging.getLogger("csp_spark")


def _df(x: TickStream | DataFrame) -> DataFrame:
    return x.df if isinstance(x, TickStream) else x


def publish_parquet(
    x: TickStream | DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by_date: bool = True,
    field_map: dict[str, str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """ParquetWriter.publish parity (output_adapters/parquet.py:40-120).

    ``field_map`` renames columns on the way out (the reference's
    column-per-field mapping). Date partitioning keeps per-partition
    file sizes bounded and enables partition pruning on replay.
    ``options`` pass through to the parquet writer (compression,
    parquet.enable.dictionary, parquet.page.size, ...).
    """
    df = _df(x)
    if field_map:
        for src, dst in field_map.items():
            df = df.withColumnRenamed(src, dst)
    writer = df.write.mode(mode)
    if partition_by_date and TS in df.columns:
        df = df.withColumn("__date", F.to_date(F.col(TS)))
        writer = df.write.mode(mode).partitionBy("__date")
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(path)


def publish_struct(
    x: TickStream | DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by_date: bool = True,
    field_map: dict[str, str] | None = None,
    value_col: str = "value",
) -> None:
    """ParquetWriter.publish_struct parity (output_adapters/
    parquet.py:120-180): one parquet column per struct FIELD — the
    struct value column flattens to top-level columns before the
    write (unset fields land as NULL), then the normal publish path
    (field_map rename, date partitioning) applies. A dict-basket
    publish is the same call: in the long format the basket key IS
    the ``key`` column, already a top-level column."""
    df = _df(x)
    others = [c for c in df.columns if c != value_col]
    df = df.select(*others, F.col(f"{value_col}.*"))
    publish_parquet(df, path, mode, partition_by_date, field_map)


def publish_csv(
    x: TickStream | DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """CSVWriter parity (csp/adapters/csv.py — writer side)."""
    _df(x).write.mode(mode).option("header", str(header).lower()).csv(path)


def write_record_batches(x: TickStream | DataFrame) -> "Any":
    """Arrow IPC out (csp/adapters/arrow.py:104-155): return the result
    as a pyarrow Table (caller writes IPC/feather as needed)."""
    return _df(x).toArrow()


def publish_kafka_stream(
    x: TickStream | DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    value_format: str = "json",
):
    """KafkaAdapterManager.publish parity (csp/adapters/kafka.py:192-240)
    for realtime mode: value is the JSON of all non-key columns.
    Returns the StreamingQuery. Requires a reachable broker (not
    available in tests — exercised structurally only)."""
    df = _df(x)
    payload = F.to_json(F.struct(*[c for c in df.columns if c != KEY]))
    out = df.select(
        F.col(KEY).cast("string").alias("key"), payload.alias("value")
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def publish_parquet_stream(
    x: TickStream | DataFrame, path: str, checkpoint_dir: str, trigger: dict | None = None
):
    """Streaming parquet sink (ParquetWriter in realtime mode)."""
    writer = _df(x).writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def print_ticks(x: TickStream | DataFrame, tag: str = "", n: int = 20) -> None:
    """csp.print parity (baselib.py:181-200)."""
    df = _df(x)
    if tag:
        print(f"== {tag} ==")
    (df.orderBy(TS, SEQ) if TS in df.columns and SEQ in df.columns else df).show(
        n, truncate=False
    )


class LogSettings:
    """csp.LogSettings parity (reference baselib.py:86-104): choose the
    logger csp.log writes to (and a display timezone). Thread-local,
    like the reference."""

    import threading as _threading

    TLS = _threading.local()

    def __init__(self, logger_name: str = "csp_spark", logging_tz=None):
        self.logger = logging.getLogger(logger_name)
        self.logging_tz = logging_tz

    @classmethod
    def set(cls, logger_name: str = "csp_spark", logging_tz=None) -> None:
        cls.TLS.instance = cls(logger_name=logger_name, logging_tz=logging_tz)

    @classmethod
    def current(cls) -> "LogSettings":
        if not hasattr(cls.TLS, "instance"):
            cls.set()
        return cls.TLS.instance


def log_ticks(
    x: TickStream | DataFrame, level: int = logging.INFO, tag: str = "", n: int = 1000
) -> None:
    """csp.log parity (baselib.py:203-274): log collected rows to the
    LogSettings logger. Driver-side by design (logging is a driver/
    console concern, bounded by n)."""
    lg = LogSettings.current().logger
    for row in _df(x).limit(n).collect():
        lg.log(level, "%s %s", tag, row.asDict())


def stop_engine_limit(x: TickStream, n_ticks: int) -> TickStream:
    """csp.stop_engine analog (baselib.py:535-541): bound the run to the
    first ``n_ticks`` engine-ordered ticks (per key)."""
    from ..operators.baselib import firstN

    return firstN(x, n_ticks)


def struct_to_record_batches(
    x: "TickStream | DataFrame",
    cls: type | None = None,
    field_map: dict[str, str] | None = None,
    max_batch_size: int = 65536,
    value_col: str = "value",
) -> list:
    """struct_to_record_batches parity (csp/adapters/arrow.py:270-330):
    a struct-valued stream out as Arrow RecordBatches — struct fields
    flatten to one arrow column each, ``field_map`` maps struct field
    -> arrow column name, ``max_batch_size`` chunks rows per batch
    (0 disables chunking, reference default 65536).

    The flatten/rename happens in the Spark plan; the Arrow transfer is
    one ``toArrow()`` IPC collection (this is a driver-side egress
    tool, same contract as write_record_batches). When ``cls`` (a
    Struct subclass) is given, the struct column is cast to
    ``cls.spark_type()`` first — fields emerge in the class's declared
    order and types, matching the reference's typed conversion."""
    df = _df(x)
    others = [c for c in df.columns if c != value_col]
    vcol = F.col(value_col)
    if cls is not None:
        from ..core.record import Struct

        if not (isinstance(cls, type) and issubclass(cls, Struct)):
            raise TypeError(
                f"cls must be a csp_spark Struct subclass, got {cls}"
            )
        vcol = vcol.cast(cls.spark_type())
    df = df.select(*others, vcol.alias(value_col)).select(
        *others, F.col(f"{value_col}.*")
    )
    if field_map:
        for f, col in field_map.items():
            if f in df.columns:
                df = df.withColumnRenamed(f, col)
    tbl = df.toArrow()
    if max_batch_size and max_batch_size > 0:
        return tbl.to_batches(max_chunksize=max_batch_size)
    return tbl.to_batches()


class OutputAdapter:
    """User output-adapter authoring base (reference
    csp/impl/outputadapter.py:8-17): subclass with ``on_tick(time,
    value)`` plus optional start/stop hooks; drive it through
    :func:`to_output_adapter` (batch) or ``foreachBatch`` (streaming).
    """

    def on_tick(self, time, value):
        raise NotImplementedError

    def start(self):
        pass

    def stop(self):
        pass


def to_output_adapter(
    x: "TickStream | DataFrame",
    adapter: OutputAdapter,
    key: str | None = None,
) -> int:
    """py_output_adapter_def parity (csp/impl/wiring/adapters.py:351):
    deliver the stream's ticks to a user OutputAdapter in engine order.
    Driver-side delivery, exactly like the reference engine thread
    calling on_tick row-by-row — an egress tool for bounded results
    (UIs, sockets, hand-rolled writers), not the bulk path (that's the
    parquet/kafka sinks). Returns the tick count delivered."""
    df = _df(x)
    if key is not None:
        df = df.filter(F.col(KEY) == key)
    # KEY last: seq restarts per key, so coincident (ts, seq) rows from
    # different keys need the key tiebreak for reproducible delivery
    rows = df.orderBy(TS, SEQ, KEY).collect()
    adapter.start()
    try:
        for r in rows:
            adapter.on_tick(r[TS], r[VALUE])
    finally:
        adapter.stop()
    return len(rows)


def py_output_adapter_def(
    name: str, adapterimpl: type, manager_type: type | None = None,
    **defaults,
):
    """Factory convention mirroring the reference
    (csp/impl/wiring/adapters.py:351): returns a callable
    ``Out(x, **impl_kwargs)``. Kwargs whose values are TYPES (incl.
    ts[...] markers) are the reference's PARAMETER DECLARATIONS —
    dropped from the impl kwargs; ts-annotated names take the stream
    argument. Non-type kwargs are default values.

    With ``manager_type`` the factory is ``Out(manager, x,
    <declared scalars...>)`` and the impl is constructed as
    ``adapterimpl(manager_impl, *scalars)`` sharing the manager's ONE
    runtime impl with its input adapters; tick delivery is deferred to
    the end of the manager's realtime capture window
    (impl/pushadapter.drive_captures), since the inputs only
    materialize then."""
    from ..core.surface import ts as _ts_marker

    value_defaults = {
        k: v for k, v in defaults.items()
        if not isinstance(v, type) and v is not _ts_marker
    }

    if manager_type is not None:
        def factory(mgr, x, *args, **kwargs):  # noqa: ANN001
            from ..impl.pushadapter import _current_frame

            frame = _current_frame()
            groups = frame.setdefault("push_captures", [])
            group = next(
                (g for g in groups
                 if g.get("mgr") is mgr and not g.get("done")),
                None,
            )
            if group is None:
                group = {"mgr": mgr, "entries": []}
                groups.append(group)
            group.setdefault("outputs", []).append({
                "adapterimpl": adapterimpl,
                "stream": x,
                "args": args,
                "kwargs": {**value_defaults, **kwargs},
            })
            return None

        factory.__name__ = name
        return factory

    def factory(x, key: str | None = None, **kwargs) -> int:
        merged = dict(value_defaults)
        merged.update(kwargs)
        return to_output_adapter(x, adapterimpl(**merged), key=key)

    factory.__name__ = name
    return factory
