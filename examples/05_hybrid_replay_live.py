"""Hybrid replay→live: one logical engine run that processes history
in the batch engine, seeds the streaming state stores with its
terminal state, and continues live — state crosses the switch, so the
first live EMA tick continues the historical recursion exactly.

Run: python examples/05_hybrid_replay_live.py
"""
import datetime as dt
import math
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

import csp_spark as csp
from csp_spark import TickStream
from csp_spark.stats import ema
from csp_spark.streaming import collect_stream, file_ticks, run_hybrid_ema

START = dt.datetime(2020, 1, 1)
SCHEMA = "key string, ts timestamp, seq long, value double"


def main() -> None:
    spark = csp.get_spark(app_name="ex_hybrid")
    spark.sparkContext.setLogLevel("ERROR")

    # history: a year of daily ticks (replayed by the BATCH engine)
    hist = [("px", START + dt.timedelta(days=i), 0,
             100.0 + 10 * math.sin(i / 20)) for i in range(365)]
    hist_df = spark.createDataFrame(hist, SCHEMA)
    boundary = START + dt.timedelta(days=365)

    # live: intraday ticks landing after the switch (streamed)
    live_rows = [("px", boundary + dt.timedelta(minutes=i + 1), 0,
                  108.0 + 0.1 * i) for i in range(10)]
    d = tempfile.mkdtemp(prefix="hybrid_live_")
    spark.createDataFrame(live_rows, SCHEMA).coalesce(1).write.mode(
        "append").parquet(d)
    live = file_ticks(spark, d, SCHEMA, ts_col="ts", value_col="value",
                      key_col="key")

    replay, live_out = run_hybrid_ema(hist_df, live, alpha=0.1,
                                      boundary=boundary)
    n_replay = replay.count()
    live_ticks = sorted(
        (r["ts"], r["value"]) for r in collect_stream(live_out).collect()
    )
    print(f"replayed {n_replay} historical EMA ticks in batch")
    print("first live ticks continue the replayed state:")
    for ts, v in live_ticks[:3]:
        print(f"  {ts}  ema={v:.6f}")

    # proof: identical to one batch EMA over history + live
    full = ema(TickStream(spark.createDataFrame(hist + live_rows, SCHEMA)),
               alpha=0.1, adjust=False).df
    ref = sorted((r["ts"], r["value"]) for r in
                 full.filter(full.ts > boundary).collect())
    assert len(live_ticks) == len(ref) == 10
    for (t1, v1), (t2, v2) in zip(live_ticks, ref):
        assert t1 == t2 and math.isclose(v1, v2, rel_tol=1e-12)
    print("live output == single batch run over history ∪ live: OK")
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
