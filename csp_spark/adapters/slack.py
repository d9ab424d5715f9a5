"""csp.adapters.slack parity (reference csp/adapters/slack.py:1-4).

The reference module is an import SHIM: the actual adapter lives in
the external ``csp-adapter-slack`` package and the in-tree module just
re-exports it (or raises with install guidance). Same contract here —
plus a built-in minimal data path, ``publish_messages``, so a chat
sink works without the external package: each tick POSTs a JSON
message through an injectable ``sender`` (swap in ``urllib.request``
against a Slack incoming-webhook URL in a connected deployment; this
container has no network, so tests inject a recorder).
"""

from __future__ import annotations

import json
from typing import Any, Callable

try:  # reference behavior: prefer the external adapter when installed
    from csp_adapter_slack import *  # noqa: F401,F403
    _HAVE_EXTERNAL = True
except ImportError:
    _HAVE_EXTERNAL = False


def default_sender(url: str) -> Callable[[bytes], None]:
    """POST JSON payloads to a Slack incoming webhook (needs network)."""
    import urllib.request

    def send(payload: bytes) -> None:
        req = urllib.request.Request(
            url, data=payload,
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req).close()

    return send


def publish_messages(
    x: "Any",
    channel: str,
    sender: Callable[[bytes], None],
    fmt: Callable[[Any], str] = str,
) -> int:
    """Send one Slack message per tick of ``x`` (TickStream), in engine
    order. Driver-side terminal sink (like print/log — chat sinks are
    inherently driver-paced); returns the message count."""
    n = 0
    for ts, v in x.collect_ticks():
        body = json.dumps(
            {"channel": channel, "text": f"{ts} {fmt(v)}"}
        ).encode()
        sender(body)
        n += 1
    return n
