"""Pandas extension type + accessors (reference pandas_ext_type.py /
pandas_accessor.py): Series/DataFrames of edges, elementwise dunder
broadcasting, one-pass run/snap, to_csp lifting."""

import datetime as dt

import pandas as pd
import pytest

from csp_spark import TickStream, TsArray, TsDtype
from csp_spark.operators import baselib as bl

START = dt.datetime(2020, 1, 1)


def t(s):
    return START + dt.timedelta(seconds=s)


@pytest.fixture()
def edges(spark):
    a = bl.curve(spark, [(t(0), 1.0), (t(2), 2.0)])
    b = bl.curve(spark, [(t(1), 10.0), (t(3), 20.0)])
    return a, b


def test_tsdtype_parsing_and_registry():
    assert TsDtype(float) is TsDtype("ts[float]")
    assert TsDtype("float").subtype is float
    assert TsDtype(int).name == "ts[int]"
    with pytest.raises(TypeError):
        TsDtype.construct_from_string("notats")
    # registered: pandas resolves the string dtype to our array type
    arr = pd.array([None], dtype="ts[float]")
    assert isinstance(arr, TsArray) and arr.dtype == TsDtype(float)


def test_series_of_edges_dunder_broadcast(spark, edges):
    a, b = edges
    s = pd.Series(TsArray([a, b]), index=["a", "b"], name="px")
    assert s.dtype == TsDtype(float)
    # elementwise arithmetic builds new edges cell-wise
    s2 = s * 2 + 1
    assert isinstance(s2.dtype, TsDtype)
    assert all(isinstance(e, TickStream) for e in s2)
    got = s2.csp.run()
    assert list(got.loc["a"]) == [3.0, 5.0]
    assert list(got.loc["b"]) == [21.0, 41.0]
    # run index carries (label, time)
    assert got.index.names[-1] == "time"
    assert list(got.loc["a"].index) == [t(0), t(2)]


def test_series_accessor_apply_run_snap(spark, edges):
    a, b = edges
    s = pd.Series(TsArray([a, b]), index=["a", "b"], name="px")
    # apply: edge-level function over every cell
    shifted = s.csp.apply(lambda e: e + 100.0)
    got = shifted.csp.run()
    assert list(got.loc["a"]) == [101.0, 102.0]
    # run window filters
    w = s.csp.run(starttime=t(1), endtime=t(2))
    assert list(w.loc["a"]) == [2.0] and list(w.loc["b"]) == [10.0]
    # snap: first tick per edge, original index
    snap = s.csp.snap()
    assert list(snap.index) == ["a", "b"]
    assert list(snap) == [1.0, 10.0]


def test_to_csp_lifts_series(spark):
    ps = pd.Series([1.5, 2.5, 3.5],
                   index=pd.DatetimeIndex([t(0), t(1), t(2)]))
    e = ps.to_csp(spark)
    assert isinstance(e, TickStream)
    assert [v for _, v in e.collect_ticks()] == [1.5, 2.5, 3.5]
    # non-datetime index rejected
    with pytest.raises(TypeError, match="DatetimeIndex"):
        pd.Series([1.0], index=["x"]).to_csp(spark)


def test_dataframe_accessor_run_snap(spark, edges):
    a, b = edges
    df = pd.DataFrame({
        "bid": TsArray([a, b]),
        "ask": TsArray([a + 1.0, b + 1.0]),
        "static": [1, 2],
    }, index=["s1", "s2"])
    out = df.csp.run()
    assert list(out.columns) == ["bid", "ask"]
    # s1 ticks at t0,t2 in both columns (same clock)
    assert list(out.loc[("s1", t(0))]) == [1.0, 2.0]
    assert list(out.loc[("s2", t(3))]) == [20.0, 21.0]
    snap = df.csp.snap()
    assert list(snap["bid"]) == [1.0, 10.0]
    assert list(snap["ask"]) == [2.0, 11.0]
    assert list(snap["static"]) == [1, 2]  # non-ts columns untouched
