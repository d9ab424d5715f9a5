"""csp.Struct-parity tests — mirror reference csp/tests/impl/test_struct.py
patterns: defaults, unset access raises, inheritance, to/from dict
round-trip, and the Spark bridge (pack / apply_defaults / fromts)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csp_spark import Struct, UNSET, TickStream
from csp_spark.operators import baselib as bl

from conftest import START, TD


def t(s):
    return START + TD(seconds=s)


class Trade(Struct):
    price: float
    qty: int = 0
    venue: str


class StampedTrade(Trade):
    ts: dt.datetime
    tags: [str]  # csp's single-element-list annotation style


def test_metadata_and_inheritance():
    assert Trade.fields() == ["price", "qty", "venue"]
    assert StampedTrade.fields() == ["price", "qty", "venue", "ts", "tags"]
    assert StampedTrade.__defaults__ == {"qty": 0}


def test_defaults_and_unset():
    x = Trade(price=1.5)
    assert x.price == 1.5
    assert x.qty == 0                      # default applied
    with pytest.raises(AttributeError):
        _ = x.venue                        # declared but unset
    assert x.is_set("price") and not x.is_set("venue")
    x.venue = "X"
    assert x.venue == "X"
    x.venue = UNSET                        # un-setting
    assert not x.is_set("venue")
    with pytest.raises(AttributeError):
        Trade(nope=1)
    with pytest.raises(AttributeError):
        x.nope = 1


def test_dict_round_trip():
    x = StampedTrade(price=2.0, venue="Y", tags=["a", "b"])
    d = x.to_dict()
    assert d == {"price": 2.0, "qty": 0, "venue": "Y", "tags": ["a", "b"]}
    assert "ts" not in d                   # unset absent
    y = StampedTrade.from_dict(d)
    assert y == x
    assert Trade.from_dict({"price": 1.0}) != Trade.from_dict({"price": 2.0})


def test_spark_type():
    st = StampedTrade.spark_type()
    assert [f.name for f in st.fields] == Trade.fields() + ["ts", "tags"]
    assert st["qty"].dataType == T.LongType()
    assert st["tags"].dataType == T.ArrayType(T.StringType())


def test_pack_and_from_row(spark):
    df = spark.range(3).select(
        Trade.pack(price=F.col("id").cast("double") + 0.5).alias("v")
    )
    rows = df.select("v.*").collect()
    assert [r.price for r in rows] == [0.5, 1.5, 2.5]
    assert [r.qty for r in rows] == [0, 0, 0]       # default filled
    assert [r.venue for r in rows] == [None] * 3    # unset → NULL
    rec = Trade.from_row(df.collect()[0][0])
    assert rec.price == 0.5 and rec.qty == 0 and not rec.is_set("venue")


def test_fromts_with_defaults(spark):
    price = bl.curve(spark, [(t(1), 10.0), (t(3), 11.0)])
    qty = bl.curve(spark, [(t(2), 5.0)])
    rec = Trade.fromts({"price": price, "qty": qty})
    got = rec.collect_ticks()
    assert [ts for ts, _ in got] == [t(1), t(2), t(3)]
    # qty invalid until t(2) → packed as NULL (unset), price persists
    assert got[0][1]["price"] == 10.0 and got[0][1]["qty"] is None
    assert got[1][1]["qty"] == 5
    assert got[2][1].asDict() == {"price": 11.0, "qty": 5, "venue": None}


def test_apply_defaults_on_collectts(spark):
    from csp_spark.operators.baselib import struct_collectts

    price = bl.curve(spark, [(t(1), 10.0), (t(2), 11.0)])
    qty = bl.curve(spark, [(t(2), 7.0)])
    s = struct_collectts({"price": price, "qty": qty})
    typed = s.with_df(
        s.df.withColumn(
            s.value_col,
            Trade.apply_defaults(F.col(s.value_col), ["price", "qty"]),
        )
    )
    got = typed.collect_ticks()
    # t(1): qty didn't tick → default 0; t(2): both ticked
    assert got[0][1]["qty"] == 0
    assert got[1][1]["qty"] == 7
