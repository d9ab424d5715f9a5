"""Pandas objects holding live edges: a Series of tick streams with
cell-wise arithmetic, evaluated in ONE Spark action, plus lifting a
plain pandas series into an edge and back.

Run: python examples/06_pandas_edges.py
"""
import datetime as dt
import sys

sys.path.insert(0, ".")

import pandas as pd

import csp_spark as csp
from csp_spark import TsArray

START = dt.datetime(2020, 1, 1)


def main() -> None:
    spark = csp.get_spark(app_name="ex_pandas")
    spark.sparkContext.setLogLevel("ERROR")

    # a portfolio: one edge per symbol, held in a pandas Series
    def px(base):
        return csp.curve(spark, [(START + dt.timedelta(seconds=i),
                                  base + i * 0.5) for i in range(4)])

    prices = pd.Series(TsArray([px(100.0), px(200.0), px(50.0)]),
                       index=["ES", "NQ", "CL"], name="px")
    print("dtype:", prices.dtype)               # ts[float]

    # cell-wise arithmetic builds new Spark plans per edge
    notional = prices * 10 - 5.0

    # ONE Spark action evaluates every edge (tagged union + collect)
    ticks = notional.csp.run()
    print(ticks.groupby(level=0).last())
    assert ticks.loc["ES"].iloc[0] == 100.0 * 10 - 5
    assert len(ticks) == 12

    # snap: first tick per edge, original index preserved
    snap = prices.csp.snap()
    assert list(snap) == [100.0, 200.0, 50.0]

    # lift a plain pandas series into an edge and use engine operators
    hist = pd.Series([1.0, 2.0, 4.0],
                     index=pd.DatetimeIndex(
                         [START + dt.timedelta(seconds=i) for i in range(3)]))
    edge = hist.to_csp(spark)
    doubled = (edge * 2).collect_ticks()
    assert [v for _, v in doubled] == [2.0, 4.0, 8.0]
    print("to_csp -> engine -> values:", [v for _, v in doubled])
    print("OK")


if __name__ == "__main__":
    main()
