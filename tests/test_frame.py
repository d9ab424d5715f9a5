"""csp.DataFrame-parity tests (reference csp/tests/test_dataframe.py
patterns: column access, elementwise broadcasting, boolean filtering,
to_pandas evaluation)."""

import math

import pytest

from csp_spark import TsFrame, TickStream
from csp_spark.operators import baselib as bl

from conftest import START, TD


def t(s):
    return START + TD(seconds=s)


@pytest.fixture()
def frame(spark):
    bid = bl.curve(spark, [(t(0.5), 99.0), (t(1.5), 99.1)])
    ask = bl.curve(spark, [(t(1), 100.0), (t(2), 100.2)])
    return TsFrame({"bid": bid, "ask": ask})


def test_columns_and_access(frame):
    assert frame.columns == ["bid", "ask"]
    assert isinstance(frame["bid"], TickStream)
    assert isinstance(frame.ask, TickStream)
    sub = frame[["ask"]]
    assert sub.columns == ["ask"]
    with pytest.raises(KeyError):
        frame["nope"]
    with pytest.raises(AttributeError):
        frame.nope


def test_setitem_and_arithmetic(frame):
    frame["spread"] = frame.ask - frame.bid
    assert frame.columns == ["bid", "ask", "spread"]
    got = frame.spread.collect_ticks()
    assert [x[0] for x in got] == [t(1), t(1.5), t(2)]
    assert [round(x[1], 9) for x in got] == [1.0, 0.9, 1.1]
    # scalar broadcast over every column
    shifted = frame[["bid", "ask"]] + 1.0
    assert [v for _, v in shifted.bid.collect_ticks()] == [100.0, 100.1]
    # frame-by-frame op zips matching columns
    twice = frame[["bid"]] + frame[["bid"]]
    assert [v for _, v in twice.bid.collect_ticks()] == [198.0, 198.2]
    with pytest.raises(ValueError):
        frame[["bid"]] + frame[["ask"]]


def test_bool_stream_filter(frame, spark):
    flag = bl.curve(spark, [(t(0), False), (t(1.2), True)], "boolean")
    kept = frame[flag]
    assert [x[0] for x in kept.bid.collect_ticks()] == [t(1.5)]
    assert [x[0] for x in kept.ask.collect_ticks()] == [t(2)]


def test_to_pandas_parity(frame):
    pdf = frame.to_pandas()
    # union time index; each column NaN except at its own ticks
    assert list(pdf.index) == [t(0.5), t(1), t(1.5), t(2)]
    assert pdf["bid"].tolist()[0] == 99.0 and math.isnan(pdf["bid"].tolist()[1])
    assert math.isnan(pdf["ask"].tolist()[0]) and pdf["ask"].tolist()[1] == 100.0
    # bounded evaluation window
    sub = frame.to_pandas(starttime=t(1), endtime=t(1.5))
    assert list(sub.index) == [t(1), t(1.5)]


def test_to_spark_last_value(frame):
    rows = frame.to_spark().orderBy("ts", "seq").collect()
    assert [r["bid"] for r in rows] == [99.0, 99.0, 99.1, 99.1]
    assert [r["ask"] for r in rows] == [None, 100.0, 100.0, 100.2]
