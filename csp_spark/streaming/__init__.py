from .sources import (
    PushAdapter,
    PushGroup,
    PushPullAdapter,
    file_ticks,
    kafka_ticks,
    rate_ticks,
    socket_ticks,
)
from .ops import (
    align_stream,
    burst_stream,
    dedup_stream,
    conflate_last_value,
    ema_stream,
    rolling_tick_stats_stream,
    rolling_time_stats_stream,
    with_watermark,
)
from .run import collect_stream, start_memory_sink
from .websocket import WebSocketClient, WebsocketAdapter
from .hybrid import (
    SEED_SEQ,
    run_hybrid_align,
    run_hybrid_ema,
    seed_ticks,
    spliced,
    terminal_last_values,
)

__all__ = [
    "PushPullAdapter",
    "WebSocketClient",
    "WebsocketAdapter",
    "SEED_SEQ",
    "run_hybrid_align",
    "run_hybrid_ema",
    "seed_ticks",
    "spliced",
    "terminal_last_values",
    "PushAdapter",
    "PushGroup",
    "file_ticks",
    "kafka_ticks",
    "rate_ticks",
    "socket_ticks",
    "with_watermark",
    "conflate_last_value",
    "align_stream",
    "burst_stream",
    "dedup_stream",
    "rolling_tick_stats_stream",
    "rolling_time_stats_stream",
    "ema_stream",
    "collect_stream",
    "start_memory_sink",
]
