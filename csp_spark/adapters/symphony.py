"""csp.adapters.symphony parity (reference csp/adapters/symphony.py:1-4).

Like the reference: an import shim for the external
``csp-adapter-symphony`` package, with the same minimal built-in
publish path as the Slack module (injectable sender, see
adapters/slack.py).
"""

from __future__ import annotations

try:
    from csp_adapter_symphony import *  # noqa: F401,F403
    _HAVE_EXTERNAL = True
except ImportError:
    _HAVE_EXTERNAL = False

from .slack import publish_messages  # noqa: F401  (same wire shape)
