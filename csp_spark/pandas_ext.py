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

    def _reduce(self, name, *, skipna: bool = True, keepdims: bool = False,
                **kwargs):
        """Reductions over a Series of EDGES produce one edge (the
        reference pandas extension's semantics: sum/mean/min/max/prod
        fold the aligned last values across the basket). NaN edges
        (missing) are dropped like skipna."""
        # NA = None/NaN cells; plain floats are CONSTANT participants
        # (the edge dunders fold them like numpy broadcast would)
        def _is_na(e):
            return e is None or (isinstance(e, float) and np.isnan(e))

        if not skipna and any(_is_na(e) for e in self._data):
            return float("nan")
        edges = [e for e in self._data if not _is_na(e)]
        if not edges:
            raise TypeError(f"cannot reduce an empty ts series: {name}")
        if not any(isinstance(e, TickStream) for e in edges):
            # all-constant series: plain numeric reduction
            import numpy as _np

            return getattr(_np, name)(edges)
        # fold starting from an edge so constants ride the dunders
        edges.sort(key=lambda e: not isinstance(e, TickStream))
        import operator as _op


        def _fold(op):
            out = edges[0]
            for e in edges[1:]:
                out = op(out, e)
            return out

        if name == "sum":
            res = _fold(_op.add)
        elif name == "prod":
            res = _fold(_op.mul)
        elif name == "mean":
            res = _fold(_op.add) / float(len(edges))
        elif name == "min":
            from . import math as _m

            res = _fold(lambda a, b: _m.min(a, b))
        elif name == "max":
            from . import math as _m

            res = _fold(lambda a, b: _m.max(a, b))
        else:
            raise TypeError(
                f"'TsArray' with dtype {self.dtype} does not support "
                f"reduction '{name}'"
            )
        if keepdims:
            return type(self)([res], dtype=self._dtype)
        return res


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
    # reference run() signature: endtime may be a timedelta from start
    if isinstance(endtime, _dt.timedelta):
        if starttime is None:
            raise ValueError("endtime as a timedelta needs starttime")
        endtime = starttime + endtime
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
        """Reference pandas_accessor.py:179-196: Edge.apply per cell —
        ``func`` maps each VALUE of each edge (``s.csp.apply(np.log)``);
        a ``(func, typ)`` tuple names a different output type. For
        edge-level transforms (e.g. csp.ema) use ``pipe``."""
        out = [
            e.apply(func, *args, **kwargs) if isinstance(e, TickStream)
            else e
            for e in self._obj
        ]
        return pd.Series(
            TsArray(out, dtype=TsDtype(self._obj.dtype.subtype
                                       if isinstance(self._obj.dtype, TsDtype)
                                       else float)),
            index=self._obj.index, name=self._obj.name,
        )

    def pipe(self, func, *args, **kwargs):
        """Edge-level transform per cell (``s.csp.pipe(csp.ema,
        alpha=.1)``) — the counterpart of the value-level ``apply``."""
        out = [
            e.pipe(func, *args, **kwargs) if isinstance(e, TickStream)
            else e
            for e in self._obj
        ]
        return pd.Series(
            TsArray(out, dtype=TsDtype(self._obj.dtype.subtype
                                       if isinstance(self._obj.dtype, TsDtype)
                                       else float)),
            index=self._obj.index, name=self._obj.name,
        )

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
    """Reference pandas_accessor.py:388-428: lift a DatetimeIndex-ed
    pandas Series into an edge; a MultiIndex (outer labels, inner
    DatetimeIndex — the shape ``df.csp.run`` returns) lifts into a
    Series of edges per outer label (TsDtype). ``spark`` is optional
    (ambient session); reference calls pass drop_na first."""

    def __init__(self, obj: pd.Series):
        self._obj = obj

    def _lift_one(self, spark, s, drop_na, key) -> TickStream:
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

    def __call__(self, spark=None, drop_na: bool = False,
                 key: str = GLOBAL_KEY):
        if isinstance(spark, bool):  # reference form: to_csp(drop_na)
            spark, drop_na = None, spark
        if spark is None:
            from .core.session import get_spark

            spark = get_spark()
        s = self._obj
        if s.index.nlevels == 1:
            return self._lift_one(spark, s, drop_na, key)
        if not isinstance(s.index.levels[-1], pd.DatetimeIndex):
            raise TypeError(
                "Last (innermost) index must be of type DatetimeIndex"
            )
        levels = list(range(s.index.nlevels - 1))
        lifted = s.groupby(level=levels, group_keys=False).apply(
            lambda sub: self._lift_one(
                spark, sub.droplevel(levels), drop_na,
                str(sub.index[0][0]) if len(levels) == 1
                else str(tuple(sub.index[0][:-1])),
            )
        )
        return lifted.astype(TsDtype(float))

    def _static_agg(self, agg: str = "last"):
        """reference pandas_accessor.py:413-428: aggregate across the
        time dimension (used by the frame to_csp for static columns)."""
        s = self._obj
        if s.index.nlevels == 1:
            if not isinstance(s.index, pd.DatetimeIndex):
                raise TypeError("Index must be of type DatetimeIndex")
            return s.groupby(np.zeros(len(s))).agg(agg).loc[0]
        if not isinstance(s.index.levels[-1], pd.DatetimeIndex):
            raise TypeError(
                "Last (innermost) index must be of type DatetimeIndex"
            )
        levels = list(range(s.index.nlevels - 1))
        return s.groupby(level=levels, group_keys=False).agg(agg)


@register_dataframe_accessor("to_csp")
class ToCspFrameAccessor:
    """Reference pandas_accessor.py:639-663: lift a pandas frame back
    into edges — selected ``columns`` become edge(-series) columns,
    the rest aggregate across time with ``agg``. A flat DatetimeIndex
    returns the dict-of-edges form; a MultiIndex (``df.csp.run``
    output) returns a DataFrame of TsDtype columns — the round-trip
    the reference example runs."""

    def __init__(self, obj: pd.DataFrame):
        self._obj = obj

    def __call__(self, spark=None, columns=None, agg: str = "last",
                 drop_na: bool = False, key: str = GLOBAL_KEY):
        if isinstance(spark, (list, tuple)):  # reference: to_csp(columns)
            spark, columns = None, spark
        outputs = {}
        for col in self._obj.columns:
            series = self._obj[col]
            if columns is None or col in columns:
                outputs[col] = series.to_csp(spark, drop_na=drop_na,
                                             key=key)
            else:
                outputs[col] = series.to_csp._static_agg(agg)
        if self._obj.index.nlevels == 1:
            return outputs
        return pd.DataFrame(outputs, columns=self._obj.columns)


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
