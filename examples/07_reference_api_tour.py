"""A tour of the reference-shaped API surface: the code below is
written the way a csp user writes it — @csp.graph, csp.curve edges,
Edge arithmetic, csp.stats functional calls, add_graph_output side
outputs, feedback, engine services — with only the import line (and
the documented spark-session argument on sources) changed.

Run: python examples/07_reference_api_tour.py
"""
import datetime as dt
import sys

sys.path.insert(0, ".")

import csp_spark as csp

START = dt.datetime(2020, 1, 1)
TD = dt.timedelta


def main() -> None:
    spark = csp.get_spark(app_name="ex_tour")
    spark.sparkContext.setLogLevel("ERROR")

    @csp.graph
    def my_graph():
        assert csp.engine_start_time() == START  # run-scoped service
        assert not csp.in_realtime()

        bid = csp.curve(spark, [(START + TD(seconds=i), 99.0 + 0.1 * i)
                                for i in range(10)])
        ask = csp.curve(spark, [(START + TD(seconds=i), 100.0 + 0.1 * i)
                                for i in range(10)])

        spread = ask - bid                      # Edge dunder arithmetic
        mid = (ask + bid) / csp.const(spark, 2.0, START)

        # functional stats, reference signatures
        avg5 = csp.stats.mean(mid, interval=5, min_window=1)
        csp.add_graph_output("spread", spread)  # side output
        csp.add_graph_output("mid_tail", mid, tick_count=3)

        # feedback: the bound stream, one engine cycle later
        fb = csp.feedback(float)
        fb.bind(spread)
        echoed = csp.sample(fb.out(), mid)

        return csp.Outputs(avg5=avg5, echoed=echoed)

    out = csp.run(my_graph, starttime=START, endtime=START + TD(minutes=1))
    assert set(out) == {"avg5", "echoed", "spread", "mid_tail"}
    assert len(out["mid_tail"]) == 3
    assert all(abs(v - 1.0) < 1e-9 for _, v in out["spread"])
    print("avg5 tail:", [round(v, 4) for _, v in out["avg5"][-3:]])
    print("spread ticks:", len(out["spread"]),
          "| echoed ticks:", len(out["echoed"]))

    # ------------------------------------------------------------------
    # imperative node authoring (@csp.node body style): per-cycle state,
    # ticked/valid queries, alarms, multiple outputs — run keyed-parallel
    prices = csp.curve(
        spark, [(START + TD(seconds=s), v) for s, v in
                [(0, 3.0), (1, 7.0), (2, 2.0), (9, 9.0), (10, 1.0)]]
    )

    @csp.node
    def monitor(cycle):
        out = {}
        if cycle.ticked("alarm"):                 # csp.alarms
            out["stale"] = 1.0
            return out
        st = cycle.state                          # csp.state
        h = st.get("h")
        if h is not None:
            cycle.cancel_alarm(h)
        st["h"] = cycle.schedule_alarm(TD(seconds=5), True)
        v = cycle["x"]
        if st.get("hi") is None or v > st["hi"]:
            st["hi"] = v
            out["new_high"] = v                   # csp.output(name=...)
        return out

    outs = csp.run_node(
        monitor, prices, end=START + TD(seconds=20),
        outputs={"new_high": "double", "stale": "double"},
    )
    highs = [v for _, v in outs["new_high"].collect_ticks()]
    stales = outs["stale"].collect_ticks()
    assert highs == [3.0, 7.0, 9.0]
    assert len(stales) == 2  # gaps at 2->9 and after the last tick
    print("new highs:", highs, "| stale alarms:", len(stales))
    print("OK")


if __name__ == "__main__":
    main()
