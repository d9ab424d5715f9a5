"""csp.adapters.websocket_types parity.

Reference: csp/adapters/websocket_types.py — the tiny typed vocabulary
the websocket adapter family shares: a connection-status enum (the
reference engine ticks it on its status channel) and the header-update
struct (`WebsocketAdapterManager.update_headers` payloads). The member
NAMES AND CODES are the wire contract and therefore identical; they
are re-declared here over this repo's own Enum/Struct bases
(core/enum.py, core/record.py) so status values survive the Spark
column round-trip (int codes in tick tables, `code_to_name` for
display) like every other enum in the package.

Usage with this repo's streaming stack: the RFC 6455 client
(streaming/websocket.py WebsocketAdapter) surfaces connection
lifecycle through its reconnect loop; a status STREAM, when wired,
carries these codes. `status_name` gives the codegen-side decode
column for dashboards/log sinks.
"""

from __future__ import annotations

from pyspark.sql import Column

from ..core.enum import Enum
from ..core.record import Struct

__all__ = ["WebsocketStatus", "WebsocketHeaderUpdate", "status_name"]


class WebsocketStatus(Enum):
    """Connection lifecycle codes (reference websocket_types.py —
    numeric values are the cross-engine contract, do not renumber)."""

    ACTIVE = 0
    GENERIC_ERROR = 1
    CONNECTION_FAILED = 2
    CLOSED = 3
    MESSAGE_SEND_FAIL = 4


class WebsocketHeaderUpdate(Struct):
    """One handshake-header mutation (key, value) — the payload of the
    reference's dynamic header-update channel."""

    key: str
    value: str


def status_name(code: Column) -> Column:
    """Int status-code column → readable name column, JVM-side (the
    same literal-map decode every enum in this package uses)."""
    return WebsocketStatus.code_to_name(code)
