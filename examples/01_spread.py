"""Bid/ask spread — the reference README's first example
(reference README.md:25-47), written against csp_spark.

Run: python examples/01_spread.py
"""
import datetime as dt
import sys

sys.path.insert(0, ".")

import csp_spark as csp

start = dt.datetime(2020, 1, 1)


def main() -> None:
    spark = csp.get_spark(app_name="ex_spread")
    spark.sparkContext.setLogLevel("ERROR")

    # csp.curve: replay a list of (time, value) ticks
    bid = csp.curve(spark, [(start + dt.timedelta(seconds=0.5), 99.0),
                            (start + dt.timedelta(seconds=1.5), 99.1)])
    ask = csp.curve(spark, [(start + dt.timedelta(seconds=1.0), 100.0),
                            (start + dt.timedelta(seconds=2.0), 100.2)])

    # binary math fires when either side ticks, once both are valid
    spread = csp.sub(ask, bid)
    ticks = spread.collect_ticks()
    print("spread ticks:", ticks)
    assert [round(v, 2) for _, v in ticks] == [1.0, 0.9, 1.1]


if __name__ == "__main__":
    main()
