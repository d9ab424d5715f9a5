"""csp.impl.types namespace parity (reference csp/impl/types/*): the
type-system helper modules user and adapter code imports from."""

from . import (  # noqa: F401
    autogen_types,
    common_definitions,
    container_type_normalizer,
    tstype,
    typing_utils,
)
