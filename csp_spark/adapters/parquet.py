"""csp.adapters.parquet parity: ParquetReader.subscribe / ParquetWriter
(reference csp/adapters/parquet.py:109-330; output_adapters/parquet.py:
26-180) over Spark's vectorized parquet scan + writer.

The functional surface (read_table/subscribe/publish_parquet) is the
native shape here; the classes below carry the reference's
object-oriented calling convention onto it 1:1 — a ParquetReader holds
(files, time/symbol columns, window) and hands out per-column
subscriptions; a ParquetWriter holds (path, config) and publishes
streams/structs. No state beyond the constructor args: every method
call builds a fresh Catalyst plan, so readers are reusable and
thread-safe (unlike the reference's stateful C++ reader)."""
from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any, Sequence

from ..sinks.publish import (
    publish_parquet,
    publish_parquet_stream,
    publish_struct,
    write_record_batches,
)
from ..sources.parquet import read_table, subscribe


@dataclass
class ParquetOutputConfig:
    """output_adapters/parquet.py:26-38. batch_size/write_dictionary
    map onto parquet writer options; allow_overwrite selects the save
    mode; write_arrow_binary selects the Arrow IPC egress path."""

    allow_overwrite: bool = False
    batch_size: int = 2**15
    compression: str | None = None
    write_arrow_binary: bool = False
    write_dictionary: bool = True

    def resolve_compression(self) -> "ParquetOutputConfig":
        """Returns a RESOLVED COPY (never mutates the caller's config —
        a shared instance reused across writers stays pristine)."""
        if self.compression is not None:
            return self
        from dataclasses import replace

        return replace(
            self, compression="" if self.write_arrow_binary else "snappy"
        )


class ParquetReader:
    """csp/adapters/parquet.py:109-330 calling convention. One reader =
    one file set + time/symbol column config; ``subscribe(symbol,
    column)`` returns that column's TickStream (scan-pushed filters),
    ``subscribe_all(columns)`` the struct form."""

    def __init__(
        self,
        spark,
        filename_or_list: str | Sequence[str] | None = None,
        time_column: str | None = None,
        symbol_column: str | None = None,
        start_time: _dt.datetime | None = None,
        end_time: _dt.datetime | None = None,
        time_shift: _dt.timedelta | None = None,
    ):
        from pyspark.sql import SparkSession

        if not isinstance(spark, SparkSession):
            # reference calling convention: ParquetReader(files,
            # time_column=...) with no session argument — resolve the
            # ambient one (csp/adapters/parquet.py:109)
            if filename_or_list is not None and time_column is None:
                time_column = filename_or_list
            filename_or_list = spark
            from ..core.session import get_spark

            spark = get_spark()
        self.spark = spark
        self.paths = (
            [filename_or_list]
            if isinstance(filename_or_list, str)
            else list(filename_or_list)
        )
        self.time_column = time_column
        self.symbol_column = symbol_column
        self.start_time = start_time
        self.end_time = end_time
        self.time_shift = time_shift

    def _table(self):
        from functools import reduce

        dfs = [read_table(self.spark, p) for p in self.paths]
        df = reduce(lambda a, b: a.unionByName(b), dfs)
        if self.time_shift is not None:
            from pyspark.sql import functions as F

            us = self.time_shift // _dt.timedelta(microseconds=1)
            df = df.withColumn(
                self.time_column,
                F.timestamp_micros(
                    F.unix_micros(F.col(self.time_column)) + us
                ),
            )
        return df

    def subscribe(self, column: str, symbol: str | None = None):
        from ..core.ticks import TickStream
        from pyspark.sql import functions as F

        df = self._table()
        if symbol is not None and self.symbol_column is not None:
            df = df.filter(F.col(self.symbol_column) == symbol)
        if self.start_time is not None:
            df = df.filter(F.col(self.time_column) >= F.lit(self.start_time))
        if self.end_time is not None:
            df = df.filter(F.col(self.time_column) <= F.lit(self.end_time))
        return TickStream.from_table(
            df,
            ts_col=self.time_column,
            value_col=column,
            key_col=self.symbol_column,
        )

    def subscribe_all(self, columns, symbol: str | None = None):
        """Struct subscription (reference subscribe_all:294): the named
        columns — or a csp.Struct TYPE, whose fields name them — as one
        struct-valued stream."""
        from ..core.record import Struct
        from ..core.ticks import TickStream
        from pyspark.sql import functions as F

        if isinstance(columns, type) and issubclass(columns, Struct):
            columns = list(columns.__metadata__)
        df = self._table()
        if symbol is not None and self.symbol_column is not None:
            df = df.filter(F.col(self.symbol_column) == symbol)
        if self.start_time is not None:
            df = df.filter(F.col(self.time_column) >= F.lit(self.start_time))
        if self.end_time is not None:
            df = df.filter(F.col(self.time_column) <= F.lit(self.end_time))
        keep = [self.time_column] + (
            [self.symbol_column] if self.symbol_column else []
        )
        df = df.select(*keep, F.struct(*columns).alias("value"))
        return TickStream.from_table(
            df,
            ts_col=self.time_column,
            value_col="value",
            key_col=self.symbol_column,
        )

    def subscribe_dict_basket(self, column: str, shape: Sequence[str]):
        """Reference subscribe_dict_basket (csp/adapters/parquet.py:322):
        one edge per symbol in ``shape``. The long tick format already
        IS the dict basket (symbol = key column), so this returns
        ``{symbol: TickStream}`` as per-symbol filters sharing one scan
        — Catalyst pushes each symbol predicate to the parquet reader."""
        if self.symbol_column is None:
            raise ValueError("subscribe_dict_basket requires symbol_column")
        return {s: self.subscribe(column, symbol=s) for s in shape}


class ParquetWriter:
    """output_adapters/parquet.py:40-180 calling convention: construct
    with (path, timestamp column, config), then ``publish`` streams
    into it. Batch publish = one parquet write; ``write_arrow_binary``
    returns the Arrow table instead (IPC egress)."""

    def __init__(
        self,
        file_name: str,
        timestamp_column_name: str = "ts",
        config: ParquetOutputConfig | None = None,
    ):
        self.path = file_name
        self.ts_col = timestamp_column_name
        self.config = (config or ParquetOutputConfig()).resolve_compression()
        self._pending: list = []
        self._armed = False

    def _options(self) -> dict:
        """config → parquet writer options (the reference's
        ParquetOutputConfig knobs applied to the Spark writer)."""
        opts = {
            "compression": self.config.compression or "none",
            "parquet.enable.dictionary": str(self.config.write_dictionary).lower(),
        }
        if self.config.batch_size:
            opts["parquet.page.row.count.limit"] = str(self.config.batch_size)
        return opts

    def publish(self, x, field_map: dict[str, str] | None = None) -> Any:
        # reference named-column form (output_adapters/parquet.py
        # publish(column_name, ts)): successive publishes accumulate
        # COLUMNS of one file — buffered and written as a single
        # outer-joined frame when the enclosing csp.run finishes (its
        # stop hook), or on flush() outside a run
        if isinstance(x, str) and field_map is not None:
            self._pending.append((x, field_map))
            self._arm_flush()
            return None
        mode = "overwrite" if self.config.allow_overwrite else "error"
        if self.config.write_arrow_binary:
            from ..sinks.publish import _df

            df = _df(x)
            for src, dst in (field_map or {}).items():
                df = df.withColumnRenamed(src, dst)
            return write_record_batches(df)
        publish_parquet(
            x, self.path, mode=mode, partition_by_date=False,
            field_map=field_map, options=self._options(),
        )
        return None

    def _arm_flush(self) -> None:
        if getattr(self, "_armed", False):
            return
        self._armed = True
        try:
            from ..plans.runtime import _run_info_stack, schedule_on_engine_stop

            if _run_info_stack:
                schedule_on_engine_stop(self.flush)
                return
        except Exception:
            pass
        # outside a run there is no engine stop — write immediately
        self.flush()

    def flush(self) -> None:
        """Write the accumulated named columns: one row per engine
        cycle where ANY published stream ticked, each column holding
        its stream's tick value on that cycle (null elsewhere) — the
        reference writer's row shape."""
        self._armed = False
        pending, self._pending = list(getattr(self, "_pending", [])), []
        if not pending:
            return
        from functools import reduce

        from pyspark.sql import functions as F

        from ..core.ticks import KEY, SEQ, TS

        frames = []
        for name, stream in pending:
            # KEY participates in the join: publishing a keyed stream
            # by column must align per (key, ts, seq), not collapse
            # distinct keys' coincident ticks into one row
            frames.append(
                stream.df.select(
                    KEY, TS, SEQ, F.col(stream.value_col).alias(name)
                )
            )
        out = reduce(
            lambda a, b: a.join(b, [KEY, TS, SEQ], "full_outer"), frames
        )
        keyed = out.where(F.col(KEY) != F.lit("")).limit(1).count() > 0
        if not keyed:
            out = out.drop(KEY)
        mode = "overwrite" if self.config.allow_overwrite else "error"
        order = ([KEY] if keyed else []) + [TS, SEQ]
        (
            out.orderBy(*order)
            .withColumnRenamed(TS, self.ts_col)
            .drop(SEQ)
            .coalesce(1)
            .write.mode(mode)
            .options(**self._options())
            .parquet(self.path)
        )

    def publish_struct(self, x, field_map: dict[str, str] | None = None) -> None:
        from ..core.ticks import TS

        mode = "overwrite" if self.config.allow_overwrite else "error"
        fm = dict(field_map or {})
        if self.ts_col != TS:
            fm.setdefault(TS, self.ts_col)  # timestamp_column_name
        publish_struct(
            x, self.path, mode=mode, partition_by_date=False, field_map=fm
        )


__all__ = [
    "ParquetOutputConfig",
    "ParquetReader",
    "ParquetWriter",
    "read_table",
    "subscribe",
    "publish_parquet",
    "publish_parquet_stream",
]


# reference-parity module-scope TypeVars: ported programs do
# `from csp.adapters.parquet import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
