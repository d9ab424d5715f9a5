"""csp.DataFrame parity — a named-column frame of TickStreams.

Reference: csp/dataframe.py:13-302 (column dict + elementwise dunder
broadcasting + boolean-edge filtering + to_pandas evaluation) and
csp/impl/pandas_accessor.py (the pandas bridge). The reference's
``to_perspective`` UI sink is out of scope (SURVEY.md §2.2).

Spark-first: the frame is a THIN dict of TickStreams — every
elementwise op delegates to TickStream's fluent ops (which compile to
one aligned Catalyst plan), and evaluation surfaces are:

- ``to_spark()``   — ONE wide aligned DataFrame (key, ts, seq, col...)
  with last-value persistence per column (align kernel, single key
  shuffle for the whole frame, not one per column).
- ``to_pandas()``  — csp.DataFrame.to_pandas parity: each column holds
  values only at its OWN tick times (NaN elsewhere), union time index,
  one Spark job for the whole frame.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, Mapping

from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import functions as F

from .core.align import _ticked, align
from .core.ticks import GLOBAL_KEY, KEY, SEQ, TS, TickStream

__all__ = ["TsFrame"]


class TsFrame:
    """Named columns of TickStreams with csp.DataFrame's surface."""

    def __init__(self, data: Mapping[str, TickStream] | None = None):
        self._data: dict[str, TickStream] = dict(data or {})

    # ------------------------------------------------------ container
    @property
    def columns(self) -> list[str]:
        return list(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __getattr__(self, column: str):
        try:
            return self[column]
        except KeyError:
            raise AttributeError(column)

    def __getitem__(self, columns):
        # boolean-stream selection filters every column (dataframe.py:35)
        if isinstance(columns, TickStream):
            from .operators.baselib import filter_

            return TsFrame(
                {c: filter_(columns, v) for c, v in self._data.items()}
            )
        if isinstance(columns, list):
            missing = [c for c in columns if c not in self._data]
            if missing:
                raise KeyError(f"Unrecognized columns: {missing}")
            return TsFrame({c: self._data[c] for c in columns})
        if columns not in self._data:
            raise KeyError(f"Unrecognized column: '{columns}'")
        return self._data[columns]

    def __setitem__(self, columns, values):
        if not isinstance(columns, list):
            columns = [columns]
        if isinstance(values, TsFrame):
            values = list(values._data.values())
        elif not isinstance(values, list):
            values = [values]
        if len(values) != len(columns):
            raise ValueError(f"Expected {len(columns)} values got {len(values)}")
        self._data.update(zip(columns, values))

    # ----------------------------------------------------- arithmetic
    def _apply_binary_op(self, other, method):
        if isinstance(other, TsFrame):
            values = []
            for col in self.columns:
                rhs = other._data.get(col)
                if rhs is None:
                    raise ValueError(f"Shape mismatch, missing column {col}")
                values.append(rhs)
        elif not isinstance(other, (tuple, list)):
            values = [other] * len(self._data)
        else:
            values = list(other)
        if len(values) != len(self.columns):
            raise ValueError(
                f"Shape mismatch, expected {len(self.columns)} columns "
                f"got {len(values)}"
            )
        return TsFrame(
            {
                col: method(v1, v2)
                for col, v1, v2 in zip(self.columns, self._data.values(), values)
            }
        )

    def __add__(self, o):      return self._apply_binary_op(o, lambda x, y: x + y)
    def __sub__(self, o):      return self._apply_binary_op(o, lambda x, y: x - y)
    def __mul__(self, o):      return self._apply_binary_op(o, lambda x, y: x * y)
    def __truediv__(self, o):  return self._apply_binary_op(o, lambda x, y: x / y)
    def __floordiv__(self, o): return self._apply_binary_op(o, lambda x, y: x // y)
    def __pow__(self, o):      return self._apply_binary_op(o, lambda x, y: x ** y)
    def __gt__(self, o):       return self._apply_binary_op(o, lambda x, y: x > y)
    def __ge__(self, o):       return self._apply_binary_op(o, lambda x, y: x >= y)
    def __lt__(self, o):       return self._apply_binary_op(o, lambda x, y: x < y)
    def __le__(self, o):       return self._apply_binary_op(o, lambda x, y: x <= y)

    def __repr__(self) -> str:  # pragma: no cover
        return f"TsFrame(columns={self.columns})"

    # ------------------------------------------------------ evaluation
    def _aligned(self) -> SparkDataFrame:
        if not self._data:
            raise ValueError("empty frame")
        return align(self._data, keep_ticked=True)

    def to_spark(
        self,
        starttime: _dt.datetime | None = None,
        endtime: _dt.datetime | None = None,
    ) -> SparkDataFrame:
        """Wide aligned frame (key, ts, seq, <col>...): one row per tick
        of any column, last-value persistence per column — the batch
        analogue of reading every edge in a node. Single plan, single
        key shuffle."""
        a = self._aligned().drop(*[_ticked(c) for c in self.columns])
        if starttime is not None:
            a = a.filter(F.col(TS) >= F.lit(starttime))
        if endtime is not None:
            a = a.filter(F.col(TS) <= F.lit(endtime))
        return a

    def to_pandas(
        self,
        starttime: _dt.datetime | None = None,
        endtime: _dt.datetime | None = None,
    ):
        """csp.DataFrame.to_pandas parity (dataframe.py:156-166): union
        time index, each column valued only where IT ticked (NaN
        elsewhere). Keyed frames get a (key, ts) MultiIndex; the
        degenerate single-key frame gets the reference's plain time
        index. One Spark job for the whole frame."""
        a = self._aligned()
        if starttime is not None:
            a = a.filter(F.col(TS) >= F.lit(starttime))
        if endtime is not None:
            a = a.filter(F.col(TS) <= F.lit(endtime))
        proj = [
            F.when(F.col(_ticked(c)), F.col(c)).alias(c) for c in self.columns
        ]
        pdf = (
            a.select(KEY, TS, SEQ, *proj)
            .orderBy(KEY, TS, SEQ)
            .toPandas()
        )
        keys = pdf[KEY].unique()
        if len(keys) == 1 and keys[0] == GLOBAL_KEY:
            return pdf.drop(columns=[KEY, SEQ]).set_index(TS)[self.columns]
        return pdf.drop(columns=[SEQ]).set_index([KEY, TS])[self.columns]
