"""csp.adapters.websocket parity (reference csp/adapters/websocket.py
WebsocketAdapterManager): a real RFC 6455 client adapter
(streaming/websocket.py — handshake, framing, ping/pong, reconnect)
plus the line-based socket source and in-memory push adapter
(GenericPushAdapter) for realtime tests."""
from ..streaming.sources import PushAdapter, PushGroup, socket_ticks
from ..streaming.websocket import (
    WebSocketClient, WebsocketAdapter, publish_websocket_stream,
)
from .websocket_table import (
    TableAdapter, TableManager, WebsocketTableAdapter, diff_dict,
)

__all__ = [
    "WebsocketAdapter", "WebSocketClient", "publish_websocket_stream",
    "socket_ticks", "PushAdapter", "PushGroup",
    "WebsocketTableAdapter", "TableAdapter", "TableManager", "diff_dict",
]
