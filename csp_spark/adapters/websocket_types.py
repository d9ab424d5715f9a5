"""csp.adapters.websocket_types parity (reference
csp/adapters/websocket_types.py): the status enum + header-update
struct the websocket adapter surfaces."""

from ..core.enum import Enum
from ..core.record import Struct

__all__ = ["WebsocketStatus", "WebsocketHeaderUpdate"]


class WebsocketStatus(Enum):
    ACTIVE = 0
    GENERIC_ERROR = 1
    CONNECTION_FAILED = 2
    CLOSED = 3
    MESSAGE_SEND_FAIL = 4


class WebsocketHeaderUpdate(Struct):
    key: str
    value: str
