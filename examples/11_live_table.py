"""Live row-delta tables + realtime push adapters (round-6 surfaces).

1. A reference-style PushInputAdapter pushes quotes from its own
   thread during a bounded realtime csp.run (the capture window).
2. The captured stream publishes onto a WebsocketTableAdapter table:
   GET /tables and /snap/<name> serve JSON snapshots, and websocket
   subscribers at /subscribe/<name> receive snapshot-then-update
   frames — the reference's live-UI feed (csp/adapters/websocket.py),
   served by the stdlib RFC 6455 stack.

Run: python examples/11_live_table.py
"""

import datetime as dt
import json
import threading
import time
import sys

sys.path.insert(0, ".")

import csp_spark as csp
from csp_spark import ts
from csp_spark.adapters.websocket_table import WebsocketTableAdapter
from csp_spark.impl.pushadapter import PushInputAdapter
from csp_spark.impl.wiring import py_push_adapter_def
from csp_spark.streaming.websocket import WebSocketClient
from csp_spark.utils.datetime import utc_now


class Quote(csp.Struct):
    symbol: str
    price: float


class QuoteFeed(PushInputAdapter):
    """A thread that pushes a few quotes during the engine window."""

    def __init__(self, symbols):
        super().__init__()
        self._symbols = symbols
        self._running = False
        self._thread = None

    def start(self, starttime, endtime):
        self._running = True
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        self._thread.join()

    def _run(self):
        px = 100.0
        i = 0
        while self._running:
            sym = self._symbols[i % len(self._symbols)]
            self.push_tick(Quote(symbol=sym, price=round(px, 2)))
            px *= 1.001
            i += 1
            time.sleep(0.25)


QuoteAdapter = py_push_adapter_def("QuoteAdapter", QuoteFeed, ts[Quote])


def main() -> None:
    spark = csp.get_spark(app_name="ex_live_table")
    spark.sparkContext.setLogLevel("ERROR")

    holder = {}

    def my_graph():
        quotes = QuoteAdapter(["SPY", "QQQ"])
        holder["quotes"] = quotes

    print("capturing ~2s of pushed quotes in a realtime run...")
    csp.run(my_graph, starttime=utc_now(), endtime=dt.timedelta(seconds=2),
            realtime=True)

    adapter = WebsocketTableAdapter(0, delta_updates=True).start()
    table = adapter.create_table("quotes", index="symbol")
    table.publish(holder["quotes"])

    # subscribe BEFORE the flush: the client sees live upd frames
    client = WebSocketClient(
        f"ws://127.0.0.1:{adapter.port}/subscribe/quotes"
    )
    client.connect()
    time.sleep(0.2)
    adapter.flush()

    # indexed tables deliver the merged snapshot: exactly ONE upd
    # frame per index value (2 symbols), not the per-cycle history
    print("websocket frames (one per indexed symbol):")
    frames = [json.loads(client.recv_message()) for _ in range(2)]
    for fr in frames:
        print("  ", fr)
    assert {fr["data"][0]["symbol"] for fr in frames} == {"SPY", "QQQ"}
    assert all(fr["messageType"] == "upd" for fr in frames)
    client.close()

    import http.client

    h = http.client.HTTPConnection("127.0.0.1", adapter.port, timeout=10)
    h.request("GET", "/snap/quotes")
    snap = json.loads(h.getresponse().read())
    print("HTTP snapshot (one row per symbol, last values):")
    for row in sorted(snap["snap"], key=lambda r: r["symbol"]):
        print("  ", row)
    h.close()
    adapter.stop()


if __name__ == "__main__":
    main()
