"""The tick table: csp's ``ts[T]`` edge re-expressed as a DataFrame.

Reference data model (SURVEY.md §1.1): a csp edge is a typed event
stream of ``(datetime, value)`` ticks with last-value persistence
(csp/impl/types/tstype.py:11-60; docs/wiki/concepts/CSP-Node.md:96-105).
Multiple engine cycles may share one timestamp and execute in a defined
order (docs/wiki/concepts/Execution-Modes.md:54-118), so our encoding
carries a ``seq`` tie-breaker: the total order of a stream is
``(ts, seq)`` within a ``key`` partition.

Encoding: ``DataFrame[(key: string, ts: timestamp, seq: long, value)]``.
``key`` generalizes csp's per-symbol graphs / dict baskets — Spark is
data-parallel over keys where csp spawns per-key subgraphs
(csp/impl/wiring/dynamic.py). Unkeyed csp streams use key = "" and are
documented as the non-scalable path (single partition per window op).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEY = "key"
TS = "ts"
SEQ = "seq"
VALUE = "value"

#: default key for unkeyed (single-series) streams
GLOBAL_KEY = ""

#: largest literal stream whose rows stay readable driver-side on
#: TickStream.local_rows (const-parameter folds); bigger curves carry
#: the OVER_CAP marker instead so error messages can say WHY the fold
#: refused (capped, not non-constant)
LOCAL_ROWS_CAP = 64
LOCAL_ROWS_OVER_CAP = "__local_rows_over_cap__"


def _as_ts(x: Any) -> _dt.datetime:
    if isinstance(x, _dt.datetime):
        return x
    if isinstance(x, str):
        return _dt.datetime.fromisoformat(x)
    raise TypeError(f"cannot interpret {x!r} as timestamp")


class TickStream:
    """A (possibly keyed) event stream: DataFrame with (key, ts, seq, value).

    Thin immutable wrapper; every operator returns a new TickStream over a
    new lazy DataFrame, so Catalyst sees the whole plan (graph pruning and
    common-subplan reuse come free — SURVEY.md §4 'graph pruning/memoized
    wiring' rows).
    """

    __slots__ = ("df", "value_col", "local_rows")

    def __init__(
        self,
        df: DataFrame,
        value_col: str = VALUE,
        local_rows: tuple | None = None,
    ):
        self.df = df
        self.value_col = value_col
        # driver-born (key, ts, seq, value) rows when the stream was
        # built from literals (const/curve via from_rows) — lets
        # plan-build-time constant folds (csp.random covariance) read
        # the value with NO Spark action. Derived streams drop it (a
        # transform may change values). Capped (LOCAL_ROWS_CAP): the
        # only consumer is the const-parameter fold, so a large replay
        # curve must not stay pinned on the driver for the stream's
        # lifetime.
        self.local_rows = local_rows

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @staticmethod
    def from_rows(
        spark: SparkSession,
        rows: Iterable[tuple],
        value_type: T.DataType | str = "double",
        key: str = GLOBAL_KEY,
    ) -> "TickStream":
        """csp.curve parity (csp/curve.py:16-65): replay (time, value) pairs.

        Rows may be (ts, value) or (ts, seq, value); seq defaults to the
        position among equal timestamps (csp engine-cycle order).
        """
        norm = []
        last_ts = None
        auto_seq = 0
        for r in rows:
            if len(r) == 2:
                ts, v = r
                ts = _as_ts(ts)
                auto_seq = auto_seq + 1 if ts == last_ts else 0
                seq = auto_seq
                last_ts = ts
            else:
                ts, seq, v = r
                ts = _as_ts(ts)
                # keep the auto-numbering consistent when 2- and
                # 3-tuples mix: a later 2-tuple at this timestamp must
                # continue AFTER the explicit seq, not restart at 0
                auto_seq = seq
                last_ts = ts
            norm.append((key, ts, seq, v))
        schema = T.StructType(
            [
                T.StructField(KEY, T.StringType(), False),
                T.StructField(TS, T.TimestampType(), False),
                T.StructField(SEQ, T.LongType(), False),
                T.StructField(
                    VALUE,
                    value_type
                    if isinstance(value_type, T.DataType)
                    else T._parse_datatype_string(value_type),
                    True,
                ),
            ]
        )
        return TickStream(
            spark.createDataFrame(norm, schema),
            local_rows=(
                tuple(norm) if len(norm) <= LOCAL_ROWS_CAP
                else LOCAL_ROWS_OVER_CAP
            ),
        )

    @staticmethod
    def from_table(
        df: DataFrame,
        ts_col: str,
        value_col: str,
        key_col: str | Column | None = None,
        seq_col: str | None = None,
        extra_cols: Sequence[str] = (),
    ) -> "TickStream":
        """Adapt an arbitrary timestamped table into the tick encoding.

        ParquetReader.subscribe parity (csp/adapters/parquet.py:109-180):
        ``ts_col`` is the time column, ``key_col`` the symbol column. When
        no natural ``seq`` exists we derive one per (key, ts) with a
        row_number ordered by the remaining columns for determinism.
        """
        key_expr = (
            F.lit(GLOBAL_KEY)
            if key_col is None
            else (F.col(key_col) if isinstance(key_col, str) else key_col)
        ).cast("string")
        out = df.select(
            key_expr.alias(KEY),
            F.col(ts_col).cast("timestamp").alias(TS),
            *([F.col(seq_col).cast("long").alias(SEQ)] if seq_col else []),
            F.col(value_col).alias(VALUE),
            *[F.col(c) for c in extra_cols],
        )
        if not seq_col:
            # the documented derivation — NOT a constant 0: coincident
            # ticks (same key, same ts) must land in DISTINCT engine
            # cycles or every cycle-collapsing op (align's final-row
            # filter, merge, last_value) silently drops all but one.
            # Ordered by the value/extra columns for determinism.
            from pyspark.sql.window import Window

            w = Window.partitionBy(KEY, TS).orderBy(
                VALUE, *[c for c in extra_cols]
            )
            out = out.withColumn(SEQ, F.row_number().over(w) - 1).select(
                KEY, TS, SEQ, VALUE, *extra_cols
            )
        return TickStream(out)

    @property
    def spark(self) -> SparkSession:
        return self.df.sparkSession

    def with_df(self, df: DataFrame, value_col: str | None = None) -> "TickStream":
        return TickStream(df, value_col or self.value_col)

    def __getattr__(self, name: str):
        # Reference Edge surface: ``trades.price`` on a struct-valued
        # edge projects the field as its own edge (csp Edge.__getattr__
        # → struct field access). Only struct value columns qualify —
        # anything else is a genuine AttributeError.
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            dt = self.df.schema[self.value_col].dataType
        except Exception:
            raise AttributeError(name)
        from pyspark.sql import types as T

        if isinstance(dt, T.StructType) and name in dt.fieldNames():
            from ..operators.baselib import struct_field

            return struct_field(self, name)
        raise AttributeError(name)

    # ------------------------------------------------------------------
    # inspection / collection (csp.run output parity)
    # ------------------------------------------------------------------
    def value(self) -> Column:
        return F.col(self.value_col)

    def ordered(self) -> DataFrame:
        return self.df.orderBy(KEY, TS, SEQ)

    def collect_ticks(self, key: str | None = None) -> list[tuple]:
        """Return [(ts, value)] in engine order — the shape of
        ``csp.run`` output (csp/impl/wiring/runtime.py:160-220). For keyed
        streams pass ``key`` or get a dict via :meth:`collect_all`."""
        df = self.df
        if key is not None:
            df = df.filter(F.col(KEY) == key)
        rows = df.orderBy(TS, SEQ).select(TS, self.value_col).collect()
        return [(r[0], r[1]) for r in rows]

    def collect_all(self) -> dict[str, list[tuple]]:
        rows = self.ordered().select(KEY, TS, self.value_col).collect()
        out: dict[str, list[tuple]] = {}
        for r in rows:
            out.setdefault(r[0], []).append((r[1], r[2]))
        return out

    # ------------------------------------------------------------------
    # ordering helpers
    # ------------------------------------------------------------------
    @staticmethod
    def order_window() -> Window:
        """Engine total order within a key: (ts, seq) — SURVEY.md §2.8."""
        return Window.partitionBy(KEY).orderBy(TS, SEQ)

    def renumber(self) -> "TickStream":
        """Re-derive a dense per-(key, ts) seq after ops that fan out rows
        (e.g. unroll — baselib.py:464-484 emits successive engine cycles
        at the same timestamp)."""
        w = Window.partitionBy(KEY, TS).orderBy(SEQ)
        return self.with_df(
            self.df.withColumn(SEQ, F.row_number().over(w).cast("long") - 1)
        )

    # ------------------------------------------------------------------
    # fluent Edge API (csp/impl/wiring/edge.py:1-259 — `.pipe/.apply` and
    # dunder arithmetic; docs Functional-Methods-API.md). Binary ops with
    # another stream use csp valid semantics (latest-value combine, fire
    # once both valid — csp/math.py:253-255) via the align kernel; scalar
    # operands are plain column expressions.
    # ------------------------------------------------------------------
    def pipe(self, fn, *args, **kwargs):
        return fn(self, *args, **kwargs)

    def run(self, *args, **kwargs):
        """Edge.run (docs Functional-Methods-API.md): alias for
        ``csp.run(self, ...)`` — execute just this edge and return its
        ticks under output key "0"."""
        from ..plans.runtime import run as _run

        return _run(lambda: self, *args, **kwargs)

    def apply(self, fn, *args, **kwargs) -> "TickStream":
        """Reference Edge.apply (wiring/edge.py:214-233): ``fn`` per
        tick value; a ``(fn, typ)`` tuple names a DIFFERENT output
        type (default: the input type, so array edges stay arrays);
        extra args/kwargs partial-apply. Back-compat: a single string
        second positional is the csp_spark DDL result_type form."""
        from ..operators.baselib import apply_

        result_type = kwargs.pop("result_type", None)
        if isinstance(fn, tuple):
            fn, result_type = fn
        if len(args) == 1 and isinstance(args[0], str) and not kwargs \
                and result_type is None:
            result_type, args = args[0], ()
        if result_type is None:
            result_type = dict(self.df.dtypes)[self.value_col]
        elif isinstance(result_type, type):
            from .record import _spark_type

            result_type = _spark_type(result_type).simpleString()
        if args or kwargs:
            _f, _a, _k = fn, args, kwargs
            fn = lambda x: _f(x, *_a, **_k)  # noqa: E731
        return apply_(self, fn, result_type)

    def _binop(self, other, col_fn, swap: bool = False):
        if isinstance(other, TickStream):
            from .align import binary_op

            a, b = (other, self) if swap else (self, other)
            return binary_op(a, b, col_fn)
        this = F.col(self.value_col)
        if dict(self.df.dtypes)[self.value_col].startswith("array"):
            # numpy broadcast semantics on array edges (the reference's
            # edges carry np arrays): vector other -> elementwise
            # zip_with, scalar other -> transform
            import numpy as _np

            if isinstance(other, (list, tuple, _np.ndarray)):
                arr = F.array(*[
                    F.lit(x.item() if hasattr(x, "item") else x)
                    for x in other
                ])
                fn = (lambda a, b: col_fn(b, a)) if swap else col_fn
                # numpy raises on a shape mismatch; zip_with would
                # silently null-pad — guard per row
                zipped = F.when(
                    F.size(this) == F.lit(len(other)),
                    F.zip_with(this, arr, fn),
                ).otherwise(F.raise_error(F.concat(
                    F.lit("array-edge broadcast shape mismatch: edge "
                          "length "),
                    F.size(this).cast("string"),
                    F.lit(f" vs operand length {len(other)}"),
                )))
                return self.with_df(self.df.withColumn(
                    self.value_col, zipped))
            lit = F.lit(other)
            fn = (lambda a: col_fn(lit, a)) if swap else (
                lambda a: col_fn(a, lit))
            return self.with_df(self.df.withColumn(
                self.value_col, F.transform(this, fn)))
        lit = F.lit(other)
        args = (lit, this) if swap else (this, lit)
        return self.with_df(self.df.withColumn(self.value_col, col_fn(*args)))

    def __add__(self, o):  return self._binop(o, lambda a, b: a + b)
    def __radd__(self, o): return self._binop(o, lambda a, b: a + b, swap=True)
    def __sub__(self, o):  return self._binop(o, lambda a, b: a - b)
    def __rsub__(self, o): return self._binop(o, lambda a, b: a - b, swap=True)
    def __mul__(self, o):  return self._binop(o, lambda a, b: a * b)
    def __rmul__(self, o): return self._binop(o, lambda a, b: a * b, swap=True)
    def __truediv__(self, o):
        return self._binop(o, lambda a, b: a.cast("double") / b)
    def __rtruediv__(self, o):
        return self._binop(o, lambda a, b: a.cast("double") / b, swap=True)
    def __floordiv__(self, o):
        return self._binop(o, lambda a, b: F.floor(a / b))
    def __mod__(self, o):  return self._binop(o, lambda a, b: a % b)
    def __pow__(self, o):  return self._binop(o, lambda a, b: F.pow(a, b))
    def __neg__(self):
        return self.with_df(self.df.withColumn(self.value_col, -F.col(self.value_col)))
    def __abs__(self):
        return self.with_df(self.df.withColumn(self.value_col, F.abs(F.col(self.value_col))))
    # comparison streams (csp Edge defines these as ops, not identity)
    def __eq__(self, o):   return self._binop(o, lambda a, b: a == b)
    def __ne__(self, o):   return self._binop(o, lambda a, b: a != b)
    def __lt__(self, o):   return self._binop(o, lambda a, b: a < b)
    def __gt__(self, o):   return self._binop(o, lambda a, b: a > b)
    def __le__(self, o):   return self._binop(o, lambda a, b: a <= b)
    def __ge__(self, o):   return self._binop(o, lambda a, b: a >= b)
    # __eq__ is a stream op → restore identity hashing explicitly
    __hash__ = object.__hash__

    def __repr__(self) -> str:  # pragma: no cover
        return f"TickStream(value_col={self.value_col!r}, schema={self.df.schema.simpleString()})"
