"""Typed record surface — csp.Struct parity over Spark StructType.

Reference: csp/impl/struct.py:17-346 (annotation-driven metadata,
defaults, inheritance, unset-field semantics, to_dict/from_dict) and
cpp/csp/engine/Struct.h (the native layout, which Spark's Tungsten row
format replaces outright — no layout code needed here).

Design: a ``Struct`` subclass declares fields as class annotations with
optional class-attribute defaults, exactly like the reference::

    class Trade(Struct):
        price: float
        qty: int = 0
        venue: str

Python-side instances track SET vs UNSET per field (reading an unset
field raises AttributeError, as in csp); ``to_dict`` emits only set
fields; ``from_dict`` round-trips. Spark-side, ``cls.spark_type()`` is
the StructType, UNSET maps to NULL, and ``cls.pack(...)`` builds a
typed struct Column from per-field Columns, filling missing fields
with their declared default (or NULL when none) — the bridge onto
struct_fromts/struct_field/struct_collectts, which operate on plain
struct columns.
"""

from __future__ import annotations

import datetime as _dt
import typing
from typing import Any, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["Struct", "UNSET"]


class _Unset:
    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "<UNSET>"

    def __bool__(self):
        return False


#: sentinel for "field never set" (csp's unset state)
UNSET = _Unset()

_SCALAR_TYPES: dict[type, T.DataType] = {
    float: T.DoubleType(),
    int: T.LongType(),
    str: T.StringType(),
    bool: T.BooleanType(),
    _dt.datetime: T.TimestampType(),
    _dt.date: T.DateType(),
    bytes: T.BinaryType(),
}


_NAMED_TYPES = {
    "float": float, "int": int, "str": str, "bool": bool,
    "bytes": bytes, "datetime": _dt.datetime, "dt.datetime": _dt.datetime,
    "datetime.datetime": _dt.datetime, "date": _dt.date,
    "dt.date": _dt.date, "datetime.date": _dt.date,
}


def _unwrap_optional(py: Any) -> tuple[Any, bool]:
    """``Optional[T]`` / ``T | None`` → (T, True); metadata stores the
    bare T (reference strict-struct rule: ``meta['opt_str'] is str``)."""
    import types as _types

    origin = typing.get_origin(py)
    if origin is typing.Union or origin is getattr(_types, "UnionType", None):
        args = [a for a in typing.get_args(py) if a is not type(None)]
        if len(args) == 1:
            return args[0], True
    return py, False


#: scalar subscription cast targets shared by the file/db adapters
#: (one table so the adapters can't drift; DDL strings, usable with
#: Column.cast)
PY_TO_SPARK_SCALAR = {
    float: "double", int: "long", bool: "boolean", str: "string",
    __import__("datetime").datetime: "timestamp",
    __import__("datetime").date: "date",
}


def _spark_type(py: Any) -> T.DataType:
    py, _ = _unwrap_optional(py)
    # under `from __future__ import annotations` class annotations are
    # strings — resolve the common scalar names without an eval
    if isinstance(py, str):
        if py in _NAMED_TYPES:
            py = _NAMED_TYPES[py]
        elif py.startswith("[") and py.endswith("]"):
            return T.ArrayType(_spark_type(py[1:-1].strip()))
        elif py.startswith("list[") and py.endswith("]"):
            return T.ArrayType(_spark_type(py[5:-1].strip()))
        else:
            raise TypeError(
                f"cannot resolve string annotation {py!r}; disable "
                "`from __future__ import annotations` in the declaring "
                "module or use real types"
            )
    # csp's list annotation styles: [T] and typing.List[T]
    if isinstance(py, list):
        if len(py) != 1:
            raise TypeError(f"list annotation must be single-element, got {py}")
        return T.ArrayType(_spark_type(py[0]))
    if isinstance(py, type) and issubclass(py, Struct):
        return py.spark_type()
    if py in _SCALAR_TYPES:
        return _SCALAR_TYPES[py]
    origin = typing.get_origin(py)
    if origin in (list, typing.List) or (
        isinstance(origin, type) and issubclass(origin, list)
    ):
        # the subclass arm admits FastList[T] (impl/types/typing_utils
        # parity — reference structs annotate list fields with it for
        # the native fast-list storage; Spark's ArrayType IS that)
        return T.ArrayType(_spark_type(typing.get_args(py)[0]))
    if origin in (dict, typing.Dict):
        k, v = typing.get_args(py)
        return T.MapType(_spark_type(k), _spark_type(v))
    raise TypeError(f"unsupported struct field type {py!r}")


class StructMeta(type):
    def __new__(mcls, name, bases, dct, strict: bool | None = None):
        metadata: dict[str, Any] = {}
        defaults: dict[str, Any] = {}
        base_strict = None
        for base in bases:
            if isinstance(base, StructMeta):
                metadata.update(getattr(base, "__metadata__", {}))
                defaults.update(getattr(base, "__defaults__", {}))
                bs = getattr(base, "__strict__", None)
                if bs is not None:
                    base_strict = bs if base_strict is None else (base_strict or bs)
        # strict-mode inheritance discipline (reference
        # test_strict_structs.py test_no_mixed_inheritance): strictness
        # must be restated, and may not flip across the hierarchy
        declared = bool(strict) if strict is not None else False
        if base_strict is not None and bases != (object,):
            if base_strict and not declared:
                raise ValueError(
                    f"Struct {name} was declared non-strict but derives "
                    f"from {bases[0].__name__} which is strict"
                )
            if declared and not base_strict and bases[0] is not Struct \
                    and getattr(bases[0], "__metadata__", None):
                raise ValueError(
                    f"Struct {name} was declared strict but derives from "
                    f"{bases[0].__name__} which is non-strict"
                )
        ann = dct.get("__annotations__", {}) or {}
        for k, v in ann.items():
            if k.startswith("_"):
                continue
            v, _ = _unwrap_optional(v)
            metadata[k] = v
            if k in dct:
                defaults[k] = dct.pop(k)
        dct["__metadata__"] = metadata
        dct["__defaults__"] = defaults
        dct["__strict__"] = declared
        return super().__new__(mcls, name, bases, dct)

    def __init__(cls, name, bases, dct, strict: bool | None = None):
        super().__init__(name, bases, dct)


class Struct(metaclass=StructMeta):
    """Annotation-declared typed record (see module docstring)."""

    __metadata__: dict[str, Any] = {}
    __defaults__: dict[str, Any] = {}

    def __init__(self, **kwargs: Any):
        object.__setattr__(self, "_values", {})
        for k, v in {**type(self).__defaults__, **kwargs}.items():
            setattr(self, k, v)
        cls = type(self)
        if cls.__strict__:
            # strict mode (reference test_strict_structs.py): every
            # field without a default must be set at init
            missing = [k for k in cls.__metadata__ if k not in self._values]
            if missing:
                raise ValueError(
                    f"Struct {cls.__name__} is not valid; required fields "
                    f"[{', '.join(missing)}] were not set on init"
                )

    # ---------------------------------------------------------- python
    def __setattr__(self, name: str, value: Any):
        if name not in type(self).__metadata__:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        if value is UNSET:
            if type(self).__strict__:
                # assigning UNSET is deletion — same strict-mode rule
                # as __delattr__ (required-field invariant holds)
                raise AttributeError(
                    f"Strict struct {type(self).__name__} does not allow "
                    f"the deletion of field {name}"
                )
            self._values.pop(name, None)
        else:
            # reference type normalization: int assigned to a float
            # field coerces (Item(cost=10) is legal csp; the tick
            # table's DoubleType would reject the raw int)
            if (
                type(self).__metadata__.get(name) is float
                and type(value) is int
            ):
                value = float(value)
            self._values[name] = value

    def __getattr__(self, name: str):
        # only called when normal lookup fails
        meta = type(self).__metadata__
        if name in meta:
            values = object.__getattribute__(self, "_values")
            if name in values:
                return values[name]
            raise AttributeError(
                f"field {name!r} of {type(self).__name__} is not set"
            )
        raise AttributeError(name)

    def __delattr__(self, name: str):
        if name not in type(self).__metadata__:
            raise AttributeError(name)
        if type(self).__strict__:
            raise AttributeError(
                f"Strict struct {type(self).__name__} does not allow the "
                f"deletion of field {name}"
            )
        self._values.pop(name, None)

    def is_set(self, name: str) -> bool:
        if name not in type(self).__metadata__:
            raise AttributeError(name)
        return name in self._values

    def __eq__(self, other):
        return type(self) is type(other) and self._values == other._values

    def __hash__(self):
        return hash((type(self), tuple(sorted(self._values.items(), key=lambda kv: kv[0]))))

    def __repr__(self):
        body = ", ".join(f"{k}={v!r}" for k, v in self._values.items())
        return f"{type(self).__name__}({body})"

    def copy(self) -> "Struct":
        out = type(self).__new__(type(self))
        object.__setattr__(out, "_values", dict(self._values))
        return out

    def deepcopy(self) -> "Struct":
        """Reference PyStruct.deepcopy: nested structs/containers are
        copied, not shared."""
        import copy as _copy

        out = type(self).__new__(type(self))
        object.__setattr__(out, "_values", _copy.deepcopy(self._values))
        return out

    def update(self, **kwargs: Any) -> None:
        """Reference PyStruct.update: set the given fields, leave the
        rest as they are."""
        for k, v in kwargs.items():
            setattr(self, k, v)

    def all_fields_set(self) -> bool:
        """Reference PyStruct.all_fields_set."""
        return all(k in self._values for k in type(self).__metadata__)

    # ----------------------------------------------------- dict bridge
    @staticmethod
    def _to_python(v: Any) -> Any:
        if isinstance(v, Struct):
            return v.to_dict()
        if isinstance(v, (list, tuple)):
            return [Struct._to_python(e) for e in v]
        if isinstance(v, dict):
            return {k: Struct._to_python(e) for k, e in v.items()}
        return v

    def to_dict(self) -> dict[str, Any]:
        """Set fields only (csp struct.py to_dict — unset are absent);
        nested Structs recurse, incl. inside lists/dicts."""
        return {k: Struct._to_python(v) for k, v in self._values.items()}

    @classmethod
    def _element_struct(cls, meta: Any) -> "type[Struct] | None":
        """The nested Struct type of a field annotation, if any —
        direct, [T], list[T]."""
        if isinstance(meta, type) and issubclass(meta, Struct):
            return meta
        if isinstance(meta, list) and len(meta) == 1:
            return cls._element_struct(meta[0])
        if typing.get_origin(meta) in (list, typing.List):
            return cls._element_struct(typing.get_args(meta)[0])
        return None

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "Struct":
        # strict structs validate at construction, so build the kwargs
        # first and construct once (matches reference from_dict)
        kwargs: dict[str, Any] = {}
        for k, v in d.items():
            meta = cls.__metadata__.get(k)
            nested = cls._element_struct(meta) if meta is not None else None
            if nested is not None and isinstance(v, Mapping):
                v = nested.from_dict(v)
            elif nested is not None and isinstance(v, (list, tuple)):
                v = [
                    nested.from_dict(e) if isinstance(e, Mapping) else e
                    for e in v
                ]
            kwargs[k] = v
        return cls(**kwargs)

    # ----------------------------------------------------- json bridge
    def to_json(self, callback=None) -> str:
        """Reference struct.py:309 to_json: the set-fields dict as JSON;
        datetimes serialize ISO-8601; ``callback`` maps types the
        default encoder can't handle (the reference contract)."""
        import json as _json

        def _default(o):
            if isinstance(o, (_dt.datetime, _dt.date)):
                return o.isoformat()
            if callback is not None:
                return callback(o)
            raise TypeError(f"unserializable field value {o!r}")

        return _json.dumps(self.to_dict(), default=_default)

    @classmethod
    def _revive_json(cls, d: Mapping[str, Any]) -> dict:
        """Recursively revive ISO datetime/date strings using the
        declared metadata types, incl. inside nested structs/lists."""
        out: dict[str, Any] = {}
        for k, v in d.items():
            meta = cls.__metadata__.get(k)
            nested = cls._element_struct(meta) if meta is not None else None
            if nested is not None and isinstance(v, Mapping):
                v = nested._revive_json(v)
            elif nested is not None and isinstance(v, (list, tuple)):
                v = [
                    nested._revive_json(e) if isinstance(e, Mapping) else e
                    for e in v
                ]
            elif meta is _dt.datetime and isinstance(v, str):
                v = _dt.datetime.fromisoformat(v)
            elif meta is _dt.date and isinstance(v, str):
                v = _dt.date.fromisoformat(v)
            out[k] = v
        return out

    @classmethod
    def from_json(cls, text: str) -> "Struct":
        """Inverse of to_json (datetime fields are revived from the
        ISO strings via the declared metadata types, recursively)."""
        import json as _json

        return cls.from_dict(cls._revive_json(_json.loads(text)))

    # ----------------------------------------------------- yaml bridge
    def to_yaml(self) -> str:
        """YAML of the set fields (reference struct.py:312 to_yaml —
        dict form through the YAML emitter; nested structs become
        nested mappings)."""
        import yaml

        return yaml.safe_dump(
            self.to_dict(), default_flow_style=False, sort_keys=False
        )

    @classmethod
    def from_yaml(cls, text: str) -> "Struct":
        """Inverse of to_yaml (reference struct.py:329)."""
        import yaml

        return cls.from_dict(yaml.safe_load(text) or {})

    # ---------------------------------------------------- spark bridge
    @classmethod
    def fields(cls) -> list[str]:
        return list(cls.__metadata__)

    @classmethod
    def spark_type(cls) -> T.StructType:
        return T.StructType(
            [
                T.StructField(k, _spark_type(v), nullable=True)
                for k, v in cls.__metadata__.items()
            ]
        )

    @classmethod
    def pack(cls, **cols: Column | Any) -> Column:
        """Typed struct Column in declared field order: provided fields
        from their Columns (non-Column values become literals), missing
        fields from their default (NULL when none — unset→NULL)."""
        unknown = set(cols) - set(cls.__metadata__)
        if unknown:
            raise AttributeError(f"{cls.__name__} has no fields {sorted(unknown)}")
        parts = []
        for k, py in cls.__metadata__.items():
            st = _spark_type(py)
            if k in cols:
                c = cols[k]
                c = c if isinstance(c, Column) else F.lit(c)
                parts.append(c.cast(st).alias(k))
            elif k in cls.__defaults__:
                parts.append(F.lit(cls.__defaults__[k]).cast(st).alias(k))
            else:
                parts.append(F.lit(None).cast(st).alias(k))
        return F.struct(*parts)

    @classmethod
    def apply_defaults(cls, struct_col: Column, fields: list[str] | None = None) -> Column:
        """Fill NULL (unset) fields of an existing struct column with
        the declared defaults — e.g. over struct_collectts output,
        where fields that didn't tick this cycle are NULL. ``fields``
        names the fields actually present in the source struct (all
        declared fields when None); absent ones are defaulted/NULL."""
        present = set(cls.__metadata__ if fields is None else fields)
        out = {}
        for k, py in cls.__metadata__.items():
            if k not in present:
                continue  # pack() fills it from the default / NULL
            c = struct_col[k]
            if k in cls.__defaults__:
                c = F.coalesce(c, F.lit(cls.__defaults__[k]).cast(_spark_type(py)))
            out[k] = c
        return cls.pack(**out)

    @classmethod
    def from_row(cls, row: Any) -> "Struct":
        """Instance from a Spark Row / mapping; NULL → unset."""
        d = row.asDict(recursive=True) if hasattr(row, "asDict") else dict(row)
        return cls.from_dict({k: v for k, v in d.items() if v is not None})

    @classmethod
    def fromts(cls, fields: Mapping[str, Any] | None = None, trigger=None, **kw):
        """Typed struct_fromts (csp/baselib.py:684-701): last values of
        each input stream packed into this record, missing fields
        defaulted. Returns a TickStream of spark_type() structs.
        Accepts a mapping or the reference's keyword form
        (``Trade.fromts(price=..., qty=...)``)."""
        from ..core.ticks import TickStream  # noqa: F401 (type only)
        from ..operators.baselib import struct_fromts

        fields = {**(dict(fields) if fields else {}), **kw}
        s = struct_fromts(dict(fields), trigger=trigger)
        packed = cls.pack(
            **{k: F.col(f"{s.value_col}.{k}") for k in fields}
        )
        return s.with_df(
            s.df.withColumn(s.value_col, packed), s.value_col
        )

    @classmethod
    def collectts(cls, fields: Mapping[str, Any] | None = None, **kw):
        """Typed struct_collectts (reference struct.py:211-215:
        ``MyData.collectts(b=..., i=...)``): fields that ticked on the
        same engine cycle packed into this record, absent fields
        unset/NULL."""
        from ..operators.baselib import struct_collectts

        fields = {**(dict(fields) if fields else {}), **kw}
        s = struct_collectts(dict(fields))
        packed = cls.pack(
            **{k: F.col(f"{s.value_col}.{k}") for k in fields}
        )
        return s.with_df(
            s.df.withColumn(s.value_col, packed), s.value_col
        )

    @classmethod
    def metadata(cls, typed: bool = False):
        """reference struct.py:187-191 — field-name -> type mapping
        (``typed`` is accepted for signature parity; field types here
        are already the python types)."""
        return dict(cls.__metadata__)

    @classmethod
    def default_field_map(cls):
        """reference struct.py:318-326 — the identity field map the
        adapters build when none is given, nested structs recursing."""
        fm = {}
        for k, v in cls.__metadata__.items():
            if isinstance(v, type) and issubclass(v, Struct):
                fm[k] = {k: v.default_field_map()}
            else:
                fm[k] = k
        return fm
