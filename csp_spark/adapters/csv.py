"""csp.adapters.csv parity — the class-shaped ``CSVReader`` (reference
csp/adapters/csv.py:29-113) over the functional :func:`read_csv`.

Reference shape: ``CSVReader(filename, time_converter, delimiter,
symbol_column)``; ``subscribe(symbol, typ)`` / ``subscribe_all(typ)``
replay rows as struct ticks ordered by the converted time, windowed to
the engine's [starttime, endtime] when built inside a run.

Spark-first: the reference reads the file row-at-a-time through
``csv.DictReader`` on one thread; here ``spark.read.csv`` scans it
vectorized, the time column parses declaratively via ``to_timestamp``
with the converter's format, and symbol/time filters are Catalyst
predicates pushed into the scan. ``time_converter`` returns a small
spec object that still works as the reference's row callable (so
user code that calls it directly keeps working) while carrying the
(column, format) the Spark plan needs.
"""

from __future__ import annotations

import datetime as _dt

from ..sinks.publish import publish_csv
from ..sources.other import read_csv

__all__ = [
    "CSVReader",
    "time_converter",
    "YYYYMMDD_TIME_formatter",
    "read_csv",
    "publish_csv",
]

# strptime directive -> Spark datetime pattern (the subset reference
# CSV programs use; %X is locale time, fixed to HH:mm:ss like the
# reference's own YYYYMMDD_TIME_formatter assumes)
_STRPTIME_TO_SPARK = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%M": "mm", "%S": "ss", "%f": "SSSSSS",
    "%X": "HH:mm:ss", "%j": "DDD", "%%": "%",
}


def _spark_format(format_string: str) -> str:
    out, i = [], 0
    while i < len(format_string):
        if format_string[i] == "%" and i + 1 < len(format_string):
            d = format_string[i:i + 2]
            if d not in _STRPTIME_TO_SPARK:
                raise ValueError(
                    f"unsupported strptime directive {d!r} in "
                    f"{format_string!r}"
                )
            out.append(_STRPTIME_TO_SPARK[d])
            i += 2
        else:
            out.append(format_string[i])
            i += 1
    return "".join(out)


class _TimeConverter:
    """Row-callable (reference csv.py:10-18) + declarative spec."""

    def __init__(self, column: str, format_string: str, tz=None):
        self.column = column
        self.format_string = format_string
        self.spark_format = _spark_format(format_string)
        self.tz = tz

    def __call__(self, row):
        v = row[self.column]
        dt = _dt.datetime.strptime(v, self.format_string)
        if self.tz is not None:
            localize = getattr(self.tz, "localize", None)
            dt = localize(dt) if localize else dt.replace(tzinfo=self.tz)
        return dt

    def spark_ts(self):
        from pyspark.sql import functions as F

        col = F.to_timestamp(F.col(self.column), self.spark_format)
        if self.tz is not None:
            zone = getattr(self.tz, "zone", None) or str(self.tz)
            return F.to_utc_timestamp(col, zone)
        return col


def time_converter(column: str, format_string: str, tz=None):
    """reference csv.py:10-18: a converter extracting the row time from
    ``column`` with ``format_string`` (optionally tz-localized)."""
    return _TimeConverter(column, format_string, tz)


def YYYYMMDD_TIME_formatter(column: str, include_fraction: bool = False, tz=None):
    """reference csv.py:21-26."""
    format_string = "%Y%m%d %X"
    if include_fraction:
        format_string += ".%f"
    return time_converter(column, format_string, tz)


class CSVReader:
    """Reference calling convention (csv.py:29-48). One reader = one
    file + time converter + symbol column; subscriptions share the
    scan plan."""

    def __init__(
        self,
        filename: str,
        time_converter,
        delimiter: str = ",",
        symbol_column: str | None = None,
        spark=None,
    ):
        self._filename = filename
        self._symbol_column = symbol_column
        self._delimiter = delimiter
        self._time_converter = time_converter
        self._spark = spark

    def subscribe(self, symbol, typ, field_map=None, push_mode=None):
        return self._subscribe(symbol, typ, field_map, push_mode)

    def subscribe_all(self, typ, field_map=None, push_mode=None):
        return self._subscribe(None, typ, field_map, push_mode)

    def _create(self, engine, memo):
        """Runtime-half factory (reference csv.py:47): subclasses
        override this to swap in a customized CSVReaderImpl."""
        return CSVReaderImpl(engine, self)

    def _subscribe(self, symbol, typ, field_map, push_mode):
        from pyspark.sql import functions as F

        from ..core.record import Struct
        from ..core.session import get_spark
        from ..core.ticks import GLOBAL_KEY, KEY, SEQ, TS, VALUE, TickStream

        spark = self._spark or get_spark()
        if symbol is not None and self._symbol_column is None:
            # same misuse guard as the sibling DBReader.subscribe:
            # without a symbol column every row would be mislabeled
            # under this symbol (the reference delivers no rows here)
            raise RuntimeError(
                "Attempted to subscribe to symbol %s but no symbol "
                "column was passed" % symbol
            )
        tc = self._time_converter
        df = (
            spark.read.option("header", "true")
            .option("delimiter", self._delimiter)
            .csv(self._filename)
        )
        if isinstance(tc, _TimeConverter):
            ts_col = tc.spark_ts()
        elif callable(tc):
            # reference contract (csv.py:10-18): ANY row callable
            # row-dict -> datetime. Escape-hatch path: a row-at-a-time
            # UDF over the csv row struct (the declarative
            # time_converter/_TimeConverter form above is the fast
            # path Catalyst parses with — prefer it)
            from pyspark.sql.types import TimestampType

            _conv = F.udf(
                lambda r: tc(r.asDict()), TimestampType(), useArrow=False
            )
            ts_col = _conv(F.struct(*[F.col(c) for c in df.columns]))
        else:
            raise TypeError(
                "time_converter must be callable (row -> datetime) or "
                "built by csp.adapters.csv.time_converter / "
                "YYYYMMDD_TIME_formatter"
            )
        if symbol is not None and self._symbol_column is not None:
            df = df.filter(F.col(self._symbol_column) == symbol)
        # engine window when inside a run frame (reference: the sim
        # replay starts at the first row >= starttime)
        from ..plans.runtime import _run_info_stack

        if _run_info_stack:
            frame = _run_info_stack[-1]
            if frame["start"] is not None:
                df = df.filter(ts_col >= F.lit(frame["start"]))
            if frame["end"] is not None:
                df = df.filter(ts_col <= F.lit(frame["end"]))
        if isinstance(field_map, str):
            # scalar edge: csv columns are read as strings, cast to typ
            from ..core.record import PY_TO_SPARK_SCALAR

            value = F.col(field_map)
            if typ in PY_TO_SPARK_SCALAR:
                value = value.cast(PY_TO_SPARK_SCALAR[typ])
        elif isinstance(typ, type) and issubclass(typ, Struct):
            fm = field_map or {
                f: f for f in typ.__metadata__ if f in df.columns
            }
            value = typ.pack(**{sf: F.col(c) for c, sf in fm.items()})
        elif typ in (float, int, str, bool) and field_map is None:
            raise TypeError(
                "scalar subscribe needs field_map naming the csv column"
            )
        else:
            raise TypeError(f"cannot subscribe with typ={typ!r}")
        key = (
            F.col(self._symbol_column)
            if self._symbol_column and self._symbol_column in df.columns
            else F.lit(symbol if symbol is not None else GLOBAL_KEY)
        )
        out = df.select(
            key.cast("string").alias(KEY),
            ts_col.alias(TS),
            F.monotonically_increasing_id().alias(SEQ),
            value.alias(VALUE),
        )
        stream = TickStream(out)
        from ..core.surface import PushMode

        if push_mode is not None and push_mode == PushMode.LAST_VALUE:
            from ..operators.baselib import last_value

            return last_value(stream)
        return stream


# ---------------------------------------------------------------------
# Runtime halves (reference csv.py:49-113): the managed-sim classes a
# user program may SUBCLASS to customize row handling. The Spark scan
# path above stays the default CSVReader.subscribe; these drive the
# shared driver-side timeslice loop in csp_spark.impl.adaptermanager —
# the same execution shape the reference engine gives them.

from ..impl.adaptermanager import (  # noqa: E402
    ManagedSimInputAdapter, PendingRowManagerImpl, py_managed_adapter_def,
)


class CSVReaderImpl(PendingRowManagerImpl):
    """Runtime manager half (reference csv.py:49-100): one pass over
    the file in time order, routing each row to the adapters
    registered for its symbol (and to every subscribe_all adapter).
    The timeslice loop, tz normalization, and symbol dispatch live on
    the shared PendingRowManagerImpl."""

    def _row_iter(self, starttime, endtime):
        import csv as _csv

        conv = self._rep._time_converter
        with open(self._rep._filename, newline="") as fh:
            for row in _csv.DictReader(fh, delimiter=self._rep._delimiter):
                yield conv(row), row


class CSVReadAdapterImpl(ManagedSimInputAdapter):
    """Runtime per-subscription half (reference csv.py:103-107)."""

    def __init__(self, managerImpl, symbol, typ, field_map):
        managerImpl.register_input_adapter(symbol, self)
        super().__init__(typ, field_map)


def CSVReadAdapter(mgr, symbol, typ, fieldMap=None, push_mode=None):
    """Graph-time subscription via the runtime halves (reference
    csv.py:109-111 builds this with py_managed_adapter_def; here the
    def is built per call so the edge's value schema follows the
    subscribed ``typ`` instead of one generic declaration)."""
    from ..core.surface import ts as _ts

    f = py_managed_adapter_def(
        "csvadapter", CSVReadAdapterImpl, _ts[typ], type(mgr),
        symbol=str, typ=object, fieldMap=(object, None),
    )
    return f(mgr, symbol, typ, fieldMap, push_mode=push_mode)


__all__ += ["CSVReaderImpl", "CSVReadAdapterImpl", "CSVReadAdapter"]
