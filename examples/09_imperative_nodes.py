"""The @csp.node lifecycle end-to-end: the SAME node body runs in
simulation (batch), in realtime (Structured Streaming), and across a
hybrid replay→live handover with its state carried over — the
reference engine's three run modes (csp.run, csp.run realtime=True,
and the replay-then-live splice).

The node: an order-flow monitor per symbol — counts ticks, tracks an
EW average price, and emits the deviation whenever price strays >2%
from the average.

Run: python examples/09_imperative_nodes.py
"""
import datetime as dt
import sys
import tempfile

sys.path.insert(0, ".")

import csp_spark as csp
from csp_spark import TickStream, run_node
from csp_spark.streaming import (
    collect_stream,
    file_ticks,
    run_hybrid_node,
    run_node_stream,
)

START = dt.datetime(2020, 1, 1)
TD = dt.timedelta
SCHEMA = "key string, ts timestamp, seq long, value double"


@csp.node
def monitor(cycle):
    st = cycle.state
    st["n"] = st.get("n", 0) + 1
    px = cycle["x"]
    st["ew"] = px if "ew" not in st else 0.9 * st["ew"] + 0.1 * px
    dev = (px - st["ew"]) / st["ew"]
    if abs(dev) > 0.02:
        return dev
    return None


def make_rows(n, base, start):
    rows = []
    for k, b in (("AAPL", base), ("MSFT", base * 2)):
        for i in range(n):
            px = b * (1.0 + (0.04 if i % 7 == 6 else 0.001 * (i % 5)))
            rows.append((k, start + TD(seconds=i), 0, px))
    return rows


def main() -> None:
    spark = csp.get_spark(app_name="ex_nodes")
    spark.sparkContext.setLogLevel("ERROR")

    hist = make_rows(40, 100.0, START)
    boundary = START + TD(seconds=100)
    live = make_rows(40, 101.0, boundary + TD(seconds=1))

    # 1) simulation: batch run over history
    sim = run_node(monitor, TickStream(spark.createDataFrame(hist, SCHEMA)))
    n_sim = sim.df.count()
    print("sim alerts over history:", n_sim)

    # 2) realtime: the same body over a live (file-drop) stream
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(live, SCHEMA).coalesce(2).write.mode(
            "append").parquet(f"{tmp}/drops")
        live_s = file_ticks(spark, f"{tmp}/drops", SCHEMA, ts_col="ts",
                            value_col="value", key_col="key")
        rt = collect_stream(run_node_stream(monitor, live_s))
        print("realtime alerts over live:", rt.count())

        # 3) hybrid: replay history, hand state to the live runner —
        # output must equal one batch run over history ∪ live
        replay, live_out = run_hybrid_node(
            monitor, spark.createDataFrame(hist, SCHEMA), live_s
        )
        got = sorted(
            (r["key"], r["ts"], round(r["value"], 12))
            for r in collect_stream(live_out).collect()
        )
        full = run_node(
            monitor, TickStream(spark.createDataFrame(hist + live, SCHEMA))
        ).df.filter(f"ts > timestamp'{boundary}'")
        want = sorted(
            (r["key"], r["ts"], round(r["value"], 12)) for r in full.collect()
        )
        assert got == want, "hybrid continuation must equal the unioned batch run"
        print("hybrid live alerts:", len(got), "— equal to the batch union ✓")
    print("OK")


if __name__ == "__main__":
    main()
