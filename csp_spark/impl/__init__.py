"""csp.impl namespace parity (reference csp/impl/*): the user-facing
adapter-authoring bases live here under their reference module paths
so `from csp.impl.pulladapter import PullInputAdapter` style imports
resolve (through enable_reference_alias) to the same classes exported
at the top level."""

from . import (  # noqa: F401
    adaptermanager,
    builtin_functions,
    constants,
    enum,
    error_handling,
    genericpushadapter,
    mem_cache,
    outputadapter,
    pandas,
    perspective_common,
    pulladapter,
    pushadapter,
    pushpulladapter,
    struct,
    types,
    warnings,
    wiring,
)
from .constants import UNSET  # noqa: F401
from .genericpushadapter import GenericPushAdapter  # noqa: F401
from .struct import Struct  # noqa: F401
