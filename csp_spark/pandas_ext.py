"""Pandas extension type + accessors: pandas objects holding edges.

Reference: csp/impl/pandas_ext_type.py:25 (``TsDtype`` — an
ExtensionDtype whose scalars are csp Edges, so whole pandas Series /
DataFrames hold live time-series endpoints) and
csp/impl/pandas_accessor.py:163 (``.csp`` accessors: elementwise
apply/pipe over the edges, ``run`` to evaluate everything in one
engine pass, ``snap`` for first values; ``.to_csp`` to lift a
DatetimeIndex-ed pandas Series into an edge).

Spark-first mapping: the edge is :class:`~csp_spark.TickStream`
(same fluent dunder surface). ``run`` does NOT evaluate edges one by
one — all edges of a Series share one Spark job: their tick tables
are tagged with the cell's row position, unioned, filtered to the run
window, and collected in a single action (the pandas analogue of
csp's one-engine-pass ``csp.run`` over every add_graph_output).
"""

from __future__ import annotations

import datetime as _dt
import re as _re
from typing import Any

import numpy as np
import pandas as pd
from pandas.api.extensions import (
    ExtensionArray,
    ExtensionDtype,
    register_dataframe_accessor,
    register_extension_dtype,
    register_series_accessor,
)
from pandas.core.arrays import ExtensionScalarOpsMixin

from pyspark.sql import functions as F

from .core.ticks import KEY, SEQ, TS, GLOBAL_KEY, TickStream

__all__ = ["TsDtype", "TsArray"]

_NAMED = {"float": float, "int": int, "str": str, "bool": bool}
_PY_NAME = {float: "float", int: "int", str: "str", bool: "bool"}


@register_extension_dtype
class TsDtype(ExtensionDtype):
    """``ts[subtype]`` dtype (reference pandas_ext_type.py:25): a duck
    dtype whose scalars are edges ticking ``subtype`` values."""

    kind = "O"
    na_value = None
    _match = _re.compile(r"^ts\[(?P<subtype>.+)\]$")
    _cache: dict = {}

    def __new__(cls, subtype=float):
        if isinstance(subtype, TsDtype):
            return subtype
        if isinstance(subtype, str):
            m = cls._match.match(subtype)
            name = m.group("subtype") if m else subtype
            subtype = _NAMED.get(name)
            if subtype is None:
                raise TypeError(f"cannot construct TsDtype from {name!r}")
        if subtype in cls._cache:
            return cls._cache[subtype]
        obj = object.__new__(cls)
        obj._subtype = subtype
        cls._cache[subtype] = obj
        return obj

    @property
    def subtype(self):
        return self._subtype

    @property
    def name(self) -> str:
        return f"ts[{_PY_NAME.get(self._subtype, getattr(self._subtype, '__name__', str(self._subtype)))}]"

    @property
    def type(self):
        return TickStream

    @classmethod
    def construct_from_string(cls, string):
        if not isinstance(string, str):
            raise TypeError(f"expected str, got {type(string).__name__}")
        if cls._match.match(string):
            return cls(string)
        raise TypeError(f"cannot construct a TsDtype from {string!r}")

    @classmethod
    def construct_array_type(cls):
        return TsArray

    def __repr__(self):  # pragma: no cover
        return self.name

    def __hash__(self):
        return hash(self.name)

    def __eq__(self, other):
        if isinstance(other, str):
            try:
                other = TsDtype.construct_from_string(other)
            except TypeError:
                return False
        return isinstance(other, TsDtype) and other.subtype == self.subtype


class TsArray(ExtensionArray, ExtensionScalarOpsMixin):
    """Object-backed array of edges. Arithmetic broadcasts to the
    cells' own dunders, so ``prices * 2 + fees`` over whole Series of
    edges builds new Spark plans cell-wise (reference TsObjectArray)."""

    def __init__(self, values, dtype: TsDtype | None = None, copy: bool = False):
        self._data = np.asarray(values, dtype=object)
        if copy:
            self._data = self._data.copy()
        self._dtype = dtype or TsDtype(float)

    # ------------------------------------------------ EA protocol
    @classmethod
    def _from_sequence(cls, scalars, *, dtype=None, copy=False):
        if isinstance(dtype, str):
            dtype = TsDtype.construct_from_string(dtype)
        return cls(list(scalars), dtype=dtype)

    @classmethod
    def _from_factorized(cls, values, original):  # pragma: no cover
        raise NotImplementedError("edges cannot be factorized")

    def __getitem__(self, item):
        out = self._data[item]
        if isinstance(item, (int, np.integer)):
            return out
        return type(self)(out, dtype=self._dtype)

    def __setitem__(self, key, value):
        self._data[key] = value

    def __len__(self):
        return len(self._data)

    @property
    def dtype(self):
        return self._dtype

    @property
    def nbytes(self):
        return self._data.nbytes

    def isna(self):
        return np.array([v is None for v in self._data], dtype=bool)

    def take(self, indices, *, allow_fill=False, fill_value=None):
        from pandas.core.algorithms import take

        data = take(self._data, indices, allow_fill=allow_fill,
                    fill_value=fill_value)
        return type(self)(data, dtype=self._dtype)

    def copy(self):
        return type(self)(self._data.copy(), dtype=self._dtype)

    @classmethod
    def _concat_same_type(cls, to_concat):
        data = np.concatenate([a._data for a in to_concat])
        return cls(data, dtype=to_concat[0]._dtype)

    # elementwise ops delegate to the edges' dunders


TsArray._add_arithmetic_ops()
TsArray._add_comparison_ops()


def _collect_edges(edges: "list[tuple[Any, TickStream]]",
                   starttime: _dt.datetime | None,
                   endtime: _dt.datetime | None,
                   first_only: bool = False) -> "dict[Any, list[tuple]]":
    """ONE Spark action for every edge: tag each edge's ticks with its
    cell position, union, filter to the window, collect. Returns
    {cell_label: [(ts, value), ...] in engine order}."""
    if not edges:
        return {}
    parts = []
    for pos, (_, e) in enumerate(edges):
        d = e.df.select(
            F.lit(pos).alias("__cell"), F.col(TS), F.col(SEQ),
            F.col(e.value_col).alias("__v"),
        )
        if starttime is not None:
            d = d.filter(F.col(TS) >= F.lit(starttime))
        if endtime is not None:
            d = d.filter(F.col(TS) <= F.lit(endtime))
        parts.append(d)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    rows = u.orderBy("__cell", TS, SEQ).collect()
    out: dict[Any, list[tuple]] = {label: [] for label, _ in edges}
    for r in rows:
        label = edges[r["__cell"]][0]
        bucket = out[label]
        if first_only and bucket:
            continue
        bucket.append((r[TS], r["__v"]))
    return out


class _EdgeItems:
    """Shared run/snap over (label, edge) pairs."""

    @staticmethod
    def _edge_items(obj) -> "list[tuple[Any, TickStream]]":
        return [
            (idx, e) for idx, e in obj.items() if isinstance(e, TickStream)
        ]


@register_series_accessor("csp")
class CspSeriesAccessor(_EdgeItems):
    """Reference pandas_accessor.py:163 CspSeriesAccessor."""

    def __init__(self, obj: pd.Series):
        self._obj = obj

    def apply(self, func, *args, **kwargs) -> pd.Series:
        """Elementwise edge transform: ``s.csp.apply(csp.ema, alpha=.1)``."""
        out = [
            func(e, *args, **kwargs) if isinstance(e, TickStream) else e
            for e in self._obj
        ]
        return pd.Series(
            TsArray(out, dtype=TsDtype(self._obj.dtype.subtype
                                       if isinstance(self._obj.dtype, TsDtype)
                                       else float)),
            index=self._obj.index, name=self._obj.name,
        )

    def pipe(self, func, *args, **kwargs):
        return self.apply(lambda e: e.pipe(func, *args, **kwargs))

    def run(self, starttime: _dt.datetime | None = None,
            endtime: _dt.datetime | None = None) -> pd.Series:
        """Evaluate every edge in ONE engine pass → a Series with an
        extra datetime index level of the ticked values (reference
        CspSeriesAccessor.run)."""
        data = _collect_edges(self._edge_items(self._obj), starttime, endtime)
        labels, times, values = [], [], []
        for label, ticks in data.items():
            for ts, v in ticks:
                labels.append(label)
                times.append(ts)
                values.append(v)
        idx = pd.MultiIndex.from_arrays(
            [labels, pd.DatetimeIndex(times)],
            names=[self._obj.index.name, "time"],
        )
        return pd.Series(values, index=idx, name=self._obj.name)

    def snap(self, starttime: _dt.datetime | None = None,
             endtime: _dt.datetime | None = None) -> pd.Series:
        """First tick of every edge (reference snap = tick_count=1 run),
        same index as the original series; NaN where no tick."""
        data = _collect_edges(self._edge_items(self._obj), starttime,
                              endtime, first_only=True)
        vals = [
            (data.get(idx) or [(None, None)])[0][1]
            if isinstance(e, TickStream) else None
            for idx, e in self._obj.items()
        ]
        return pd.Series(vals, index=self._obj.index, name=self._obj.name)


@register_series_accessor("to_csp")
class ToCspSeriesAccessor:
    """Reference pandas_accessor.py:389: lift a DatetimeIndex-ed pandas
    Series into an edge (csp.curve of its (time, value) pairs)."""

    def __init__(self, obj: pd.Series):
        self._obj = obj

    def __call__(self, spark, drop_na: bool = False,
                 key: str = GLOBAL_KEY) -> TickStream:
        s = self._obj
        if drop_na:
            s = s.dropna()
        idx = s.index.get_level_values(-1) if s.index.nlevels > 1 else s.index
        if not isinstance(idx, pd.DatetimeIndex):
            raise TypeError("Index must be a pd.DatetimeIndex")
        rows = [
            (key, t.to_pydatetime(), i,
             v.item() if hasattr(v, "item") else v)
            for i, (t, v) in enumerate(zip(idx, s.to_numpy()))
        ]
        vtype = {
            "float64": "double", "int64": "long", "bool": "boolean",
            "object": "string",
        }.get(str(s.dtype), "double")
        df = spark.createDataFrame(
            rows, f"{KEY} string, {TS} timestamp, {SEQ} long, value {vtype}"
        )
        return TickStream(df)


@register_dataframe_accessor("to_csp")
class ToCspFrameAccessor:
    """Reference pandas_accessor.py:640: lift a DatetimeIndex-ed pandas
    frame into a dict of edges — one per (selected) column, each the
    column's (time, value) curve."""

    def __init__(self, obj: pd.DataFrame):
        self._obj = obj

    def __call__(self, spark, columns=None, agg: str = "last",
                 drop_na: bool = False, key: str = GLOBAL_KEY) -> dict:
        cols = list(columns) if columns is not None else list(self._obj.columns)
        return {
            c: self._obj[c].to_csp(spark, drop_na=drop_na, key=key)
            for c in cols
        }


@register_dataframe_accessor("csp")
class CspDataFrameAccessor(_EdgeItems):
    """Reference pandas_accessor.py:430: frame-level run/snap across
    every ts[] column, one engine pass total."""

    def __init__(self, obj: pd.DataFrame):
        self._obj = obj

    def _ts_columns(self) -> list:
        return [c for c in self._obj.columns
                if isinstance(self._obj.dtypes[c], TsDtype)]

    def ts_frame(self) -> pd.DataFrame:
        """Only the ts[] columns (reference pandas_accessor
        CspFrameAccessor.ts_frame — feeds _frame_to_basket)."""
        return self._obj[self._ts_columns()]

    def static_frame(self) -> pd.DataFrame:
        """Only the non-ts columns (reference static_frame)."""
        static = [c for c in self._obj.columns
                  if not isinstance(self._obj.dtypes[c], TsDtype)]
        return self._obj[static]

    def run(self, starttime: _dt.datetime | None = None,
            endtime: _dt.datetime | None = None) -> pd.DataFrame:
        """Long-format frame: one engine pass over every edge of every
        ts[] column; index (row label, time), one column per ts[]
        column, NaN when that column didn't tick at that time."""
        edges = []
        for c in self._ts_columns():
            for idx, e in self._edge_items(self._obj[c]):
                edges.append(((idx, c), e))
        data = _collect_edges(edges, starttime, endtime)
        cells: dict[tuple, dict] = {}
        for (idx, c), ticks in data.items():
            for ts, v in ticks:
                cells.setdefault((idx, ts), {})[c] = v
        if not cells:
            return pd.DataFrame(columns=self._ts_columns())
        keys = sorted(cells)
        out = pd.DataFrame(
            [cells[k] for k in keys],
            index=pd.MultiIndex.from_tuples(keys, names=[None, "time"]),
            columns=self._ts_columns(),
        )
        return out

    def snap(self, starttime: _dt.datetime | None = None,
             endtime: _dt.datetime | None = None) -> pd.DataFrame:
        """First tick per (row, ts[] column), original index preserved."""
        cols = {}
        for c in self._ts_columns():
            cols[c] = self._obj[c].csp.snap(starttime, endtime)
        out = self._obj.copy()
        for c, s in cols.items():
            out[c] = s
        return out
