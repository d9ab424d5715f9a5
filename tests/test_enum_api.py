"""csp.Enum / DynamicEnum parity (reference csp/impl/enum.py and
csp/tests/impl/test_enum.py patterns) + top-level run_on_thread /
memoize / show_graph surface."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

import csp_spark
from csp_spark import DynamicEnum, Enum, memoize, run_on_thread, show_graph
from csp_spark.operators import baselib as bl


class Side(Enum):
    BUY = 0
    SELL = Enum.auto()


def test_enum_members_and_lookup():
    assert Side.BUY.value == 0 and Side.SELL.value == 1
    assert Side(1) is Side.SELL
    assert Side["BUY"] is Side.BUY
    assert Side("SELL") is Side.SELL
    assert [m.name for m in Side] == ["BUY", "SELL"]
    assert dict(Side.__members__) == {"BUY": Side.BUY, "SELL": Side.SELL}
    with pytest.raises(ValueError):
        Side(7)
    with pytest.raises(KeyError):
        Side["HOLD"]


def test_enum_no_subclassing():
    with pytest.raises(TypeError):
        class More(Side):  # noqa: N801
            HOLD = 2


def test_enum_rejects_non_int():
    with pytest.raises(TypeError):
        class Bad(Enum):  # noqa: N801
            X = "nope"


def test_dynamic_enum():
    D = DynamicEnum("D", ["a", "b"], start=3)
    assert D["a"].value == 3 and D(4).name == "b"
    E2 = DynamicEnum("E2", {"x": 10, "y": 20})
    assert E2.x.value == 10 and E2(20) is E2.y


def test_enum_spark_columns(spark):
    df = spark.createDataFrame([(0,), (1,), (0,)], "code int")
    names = [r["n"] for r in df.select(Side.code_to_name(F.col("code")).alias("n")).collect()]
    assert names == ["BUY", "SELL", "BUY"]
    back = df.select(Side.code_to_name(F.col("code")).alias("n")).select(
        Side.name_to_code(F.col("n")).alias("c")
    )
    assert [r["c"] for r in back.collect()] == [0, 1, 0]


def test_run_on_thread(spark):
    start = dt.datetime(2020, 1, 1)

    def graph():
        return bl.curve(
            spark, [(start + dt.timedelta(seconds=i), float(i)) for i in range(5)]
        )

    runner = run_on_thread(graph)
    out = runner.join()
    assert [v for _, v in out["0"]] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert not runner.is_alive()


def test_run_on_thread_propagates_errors():
    def bad_graph():
        raise RuntimeError("boom")

    runner = run_on_thread(bad_graph)
    with pytest.raises(RuntimeError, match="boom"):
        runner.join()
    assert runner.join(suppress=True) is None


def test_memoize_single_instance(spark):
    calls = []

    @memoize
    def build(n):
        calls.append(n)
        return spark.range(n)

    a, b = build(3), build(3)
    assert a is b and calls == [3]
    assert csp_spark.csp_memoized is memoize


def test_show_graph_prints_plan(spark, capsys):
    df = spark.range(10).filter(F.col("id") > 3)
    show_graph(df)
    out = capsys.readouterr().out
    assert "Physical Plan" in out
