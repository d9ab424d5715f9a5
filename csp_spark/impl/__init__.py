"""csp.impl namespace parity (reference csp/impl/*): the user-facing
adapter-authoring bases live here under their reference module paths
so `from csp.impl.pulladapter import PullInputAdapter` style imports
resolve (through enable_reference_alias) to the same classes exported
at the top level."""

from . import (  # noqa: F401
    adaptermanager,
    outputadapter,
    pandas,
    pulladapter,
    pushadapter,
    pushpulladapter,
    wiring,
)
