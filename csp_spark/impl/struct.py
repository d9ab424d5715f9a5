"""csp.impl.struct parity (reference csp/impl/struct.py): Struct and
its metaclass plus the dynamic-definition helpers under their
defining-module path — ``from csp.impl.struct import Struct`` is the
second most common csp.impl import in reference code, and the
reference's own DB adapter builds row structs with ``define_struct``
(reference csp/adapters/db.py:271-273), so any ported program hits
these first.

``define_struct(name, metadata, defaults)`` builds a Struct subclass
at runtime from a plain ``{field: type}`` dict (reference
struct.py:350-357); ``define_nested_struct`` additionally turns any
dict-valued metadata entry into a child struct type (struct.py:359-374
— child classes are named ``{name}_{field}``, and a dict default for
a nested field becomes an INSTANCE of the child struct so the parent's
default materializes set). ``defineStruct``/``defineNestedStruct`` are
the reference's deprecated camelCase spellings kept for source
compatibility.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Any

from ..core.record import Struct, StructMeta  # noqa: F401


class _YamlHandler:
    """Module-scope YAML handler (parity: reference struct.py:14 caches
    a ``ruamel.yaml.YAML()`` instance as ``g_YAML`` — "avoid recreating
    this object every call"). ruamel isn't a dependency here; this
    exposes the same ``dump(data, stream)`` / ``load(stream)`` calls
    backed by pyyaml's safe variants, which Struct.to_yaml/from_yaml
    (core/record.py:385,396) also use — round-trips agree."""

    def dump(self, data, stream):
        import yaml

        yaml.safe_dump(data, stream, default_flow_style=False,
                       sort_keys=False)

    def load(self, stream):
        import yaml

        return yaml.safe_load(stream)


g_YAML = _YamlHandler()


def define_struct(
    name: str,
    metadata: dict,
    defaults: dict | None = None,
    base: type = Struct,
    strict: bool = False,
) -> type:
    """Dynamically create a Struct type (reference struct.py:350).

    ``metadata`` maps field name -> type annotation; ``defaults`` maps
    a subset of those fields to default values. Equivalent to writing
    the class statement with those annotations and class attributes.
    """
    body: dict[str, Any] = deepcopy(defaults) if defaults else {}
    body["__annotations__"] = dict(metadata)
    return StructMeta(name, (base,), body, strict=strict)


def define_nested_struct(
    name: str,
    metadata: dict,
    defaults: dict | None = None,
    base: type = Struct,
) -> type:
    """Dynamically create a nested Struct type (reference
    struct.py:359): dict-valued metadata entries become child struct
    classes named ``{name}_{field}``, recursively; a dict present in
    ``defaults`` for such a field seeds the CHILD's defaults, and the
    parent's default for the field becomes a child instance."""
    defaults = deepcopy(defaults) if defaults else {}
    meta: dict[str, Any] = {}
    for field, ann in metadata.items():
        if isinstance(ann, dict):
            child = define_nested_struct(
                f"{name}_{field}", ann, defaults.get(field, {})
            )
            meta[field] = child
            if field in defaults:
                defaults[field] = child()
        else:
            meta[field] = ann
    return define_struct(name, meta, defaults, base)


def defineStruct(  # noqa: N802 — reference-parity deprecated spelling
    name: str, metadata: dict, defaults: dict | None = None,
    base: type = Struct,
) -> type:
    return define_struct(name, metadata, defaults, base)


def defineNestedStruct(  # noqa: N802 — reference-parity spelling
    name: str, metadata: dict, defaults: dict | None = None,
    base: type = Struct,
) -> type:
    return define_nested_struct(name, metadata, defaults, base)
