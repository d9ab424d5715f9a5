"""Realtime mode: push ticks through the in-memory PushAdapter
(GenericPushAdapter parity) into a conflated LAST_VALUE stream —
the same logical op the batch engine runs.

Run: python examples/03_realtime.py
"""
import datetime as dt
import sys

sys.path.insert(0, ".")

import csp_spark as csp
from csp_spark.streaming import collect_stream, conflate_last_value

start = dt.datetime(2020, 1, 1)


def main() -> None:
    spark = csp.get_spark(app_name="ex_realtime")
    spark.sparkContext.setLogLevel("ERROR")

    push = csp.PushAdapter(spark, value_type="double")
    src = push.out()
    conflated = conflate_last_value(src, bucket=dt.timedelta(seconds=10))

    # three "adapter thread" bursts; each flush = one atomic microbatch
    for burst in range(3):
        for i, ms in enumerate((0, 250, 500)):
            push.push_tick(
                float(burst * 10 + i),
                ts=start + dt.timedelta(seconds=10 * burst, milliseconds=ms),
                key="sym",
            )
        push.flush()

    # complete mode: see every bucket's current LAST_VALUE without
    # waiting for the watermark to close it
    out = collect_stream(conflated, output_mode="complete")
    rows = sorted((r["ts"], r["value"]) for r in out.collect())
    print("conflated:", rows)
    assert [v for _, v in rows] == [2.0, 12.0, 22.0]  # last value per bucket
    push.stop()


if __name__ == "__main__":
    main()
