"""csp.adapters.websocket parity (reference csp/adapters/websocket.py
WebsocketAdapterManager): socket streaming source + in-memory push
adapter (GenericPushAdapter) for realtime tests."""
from ..streaming.sources import PushAdapter, PushGroup, socket_ticks

__all__ = ["socket_ticks", "PushAdapter", "PushGroup"]
