"""Streaming execution helpers.

``csp.run(realtime=True)`` parity: the reference switches the same
graph to wall-clock execution (RootEngine.cpp:170-237). Here a built
streaming DataFrame is started with writeStream; these helpers cover
the two common shapes — run-to-completion over the currently-available
data (deterministic tests, backfills) and a live memory sink for
inspection (csp's to_perspective/WebsocketTableAdapter niche)."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame


def collect_stream(x: DataFrame, output_mode: str = "append") -> DataFrame:
    """Execute the streaming plan over all currently-available input
    (Trigger.AvailableNow — processes every pending microbatch, then
    stops) into an in-memory table; returns it as a batch DataFrame.
    This is simulation-mode-over-a-stream: same operators, bounded run."""
    from ..plans.runtime import _run_info_stack

    name = f"csp_sink_{uuid.uuid4().hex[:12]}"
    # a streaming run is a realtime engine frame (csp.in_realtime True)
    _run_info_stack.append({"start": None, "end": None, "realtime": True})
    try:
        q = (
            x.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        _run_info_stack.pop()
    return x.sparkSession.table(name)


def start_memory_sink(
    x: DataFrame, name: str, output_mode: str = "append", **trigger
):
    """Live sink: start the query with a processing-time trigger and
    return the StreamingQuery; read ``spark.table(name)`` while it
    runs."""
    writer = (
        x.writeStream.format("memory").queryName(name).outputMode(output_mode)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
