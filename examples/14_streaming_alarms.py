"""Alarms in every run mode: a stale-quote watchdog — the classic
csp.alarms pattern (schedule a timeout on each tick, cancel it when a
fresh tick arrives, alert when it actually fires) — runs with the SAME
node body in simulation (run_node), in a LIVE streaming query
(run_node_stream(alarms=True): the alarm fires as its own engine cycle
at its scheduled time, woken by the event-time watermark when the key
is idle), and across a replay→live handover where the PENDING alarm
itself crosses the boundary (run_hybrid_node(alarms=True, end=...)).

Run: python examples/14_streaming_alarms.py
"""
import datetime as dt
import sys
import tempfile
import uuid

sys.path.insert(0, ".")

import csp_spark as csp
from csp_spark import TickStream, run_node
from csp_spark.streaming import file_ticks, run_hybrid_node, run_node_stream

START = dt.datetime(2020, 1, 1)
TD = dt.timedelta
SCHEMA = "key string, ts timestamp, seq long, value double"
STALE_AFTER = TD(seconds=5)


@csp.node
def watchdog(cycle):
    st = cycle.state
    if cycle.ticked("alarm"):
        # no tick for STALE_AFTER: alert with the last seen price
        st.pop("pending", None)
        return -(cycle["x"] or 0.0)
    if st.get("pending") is not None:
        cycle.cancel_alarm(st["pending"])
    st["pending"] = cycle.schedule_alarm(STALE_AFTER, True)
    return cycle["x"]


def quotes():
    # AAPL quotes every 2s until t=8, then SILENCE until t=20 (stale
    # window: the watchdog alarm fires at t=13), then one more quote;
    # MSFT stops at t=4 and never returns (alarm at t=9, still armed
    # at t=24 -> fires once)
    rows = [("AAPL", START + TD(seconds=s), 0, 100.0 + s) for s in
            (0, 2, 4, 6, 8)]
    rows += [("AAPL", START + TD(seconds=20), 0, 120.0)]
    rows += [("MSFT", START + TD(seconds=s), 0, 50.0 + s) for s in (0, 4)]
    return rows


def collect_live(out, spark):
    from csp_spark.plans.runtime import _run_info_stack

    name = f"alarm_ex_{uuid.uuid4().hex[:8]}"
    _run_info_stack.append({"start": None, "end": None, "realtime": True})
    try:
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        _run_info_stack.pop()
    return spark.table(name)


def main() -> None:
    spark = csp.get_spark(app_name="ex_alarms")
    spark.sparkContext.setLogLevel("ERROR")
    rows = quotes()
    end = START + TD(seconds=40)

    # 1) simulation: alarms merge into the replayed cycle sequence
    sim = run_node(
        watchdog, TickStream(spark.createDataFrame(rows, SCHEMA)), end=end)
    sim_rows = sorted((r["key"], r["ts"], r["seq"], r["value"])
                      for r in sim.df.collect())
    alerts = [(k, ts) for k, ts, _, v in sim_rows if v < 0]
    assert (("AAPL", START + TD(seconds=13)) in alerts
            and ("MSFT", START + TD(seconds=9)) in alerts)
    print("sim alerts:", alerts)

    with tempfile.TemporaryDirectory() as tmp:
        # 2) live: same body, microbatch drops; a final far-future
        # quote advances the watermark (the live engine's clock)
        drops = [rows[:4], rows[4:], [("ZZZ", end, 0, 0.0)],
                 [("ZZZ", end + TD(seconds=60), 0, 0.0)]]
        for i, chunk in enumerate(drops):
            spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
                "overwrite").parquet(f"{tmp}/in/b{i}")
        live_s = file_ticks(spark, f"{tmp}/in/*", SCHEMA, ts_col="ts",
                            value_col="value", key_col="key",
                            max_files_per_trigger=1)
        rt = collect_live(run_node_stream(watchdog, live_s, alarms=True),
                          spark)
        got = sorted((r["key"], r["ts"], r["seq"], r["value"])
                     for r in rt.collect() if r["key"] != "ZZZ")
        want = sorted(
            (r["key"], r["ts"], r["seq"], r["value"])
            for r in run_node(
                watchdog,
                TickStream(spark.createDataFrame(
                    rows + [("ZZZ", end, 0, 0.0),
                            ("ZZZ", end + TD(seconds=60), 0, 0.0)],
                    SCHEMA)),
                end=end + TD(seconds=60),
            ).df.collect() if r["key"] != "ZZZ")
        assert got == want, "live alarms must equal the batch replay"
        print("live == sim (alarms included):", len(got), "ticks ✓")

        # 3) handover: replay to t=10 (MSFT's t=9 alarm fires in the
        # replay; AAPL's t=13 alarm stays PENDING and crosses), then
        # the live side fires it at exactly t=13
        hist = [r for r in rows if r[1] <= START + TD(seconds=8)]
        post = [r for r in rows if r[1] > START + TD(seconds=8)]
        for i, chunk in enumerate([post, [("ZZZ", end, 0, 0.0)],
                                   [("ZZZ", end + TD(seconds=60), 0, 0.0)]]):
            spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
                "overwrite").parquet(f"{tmp}/ho/b{i}")
        ho_s = file_ticks(spark, f"{tmp}/ho/*", SCHEMA, ts_col="ts",
                          value_col="value", key_col="key",
                          max_files_per_trigger=1)
        replay_df, live_out = run_hybrid_node(
            watchdog, spark.createDataFrame(hist, SCHEMA), ho_s,
            alarms=True, end=START + TD(seconds=10),
        )
        live_ticks = [(r["key"], r["ts"], r["value"])
                      for r in collect_live(live_out, spark).collect()]
        assert ("AAPL", START + TD(seconds=13), -108.0) in live_ticks, (
            "the replay-armed AAPL alarm must fire LIVE at t=13")
        print("handover: replay-armed alarm fired live at t=13 ✓")
    print("OK")


if __name__ == "__main__":
    main()
