"""csp.Enum parity: a lightweight int-valued enum with the reference's
semantics (reference csp/impl/enum.py:10-108 — int members only,
``auto`` continuation, no subclassing an enum with members, lookup by
name or value) plus the Spark-side mapping helpers.

Spark mapping: enum fields ride in DataFrames as their int code (the
compact, comparable representation the reference's C++ engine also
uses internally) or as their name string; ``code_to_name`` /
``name_to_code`` are pure CASE/map column expressions, so enum decode
stays inside whole-stage codegen — no UDF.
"""

from __future__ import annotations

import inspect
from typing import Iterator, Mapping, Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["Enum", "DynamicEnum", "auto"]


class auto:  # noqa: N801 — matches enum.auto spelling
    """Marker for auto-numbered members (previous value + 1)."""


class EnumMeta(type):
    def __new__(mcs, name, bases, dct):
        for base in bases:
            if isinstance(base, EnumMeta) and getattr(base, "__metadata__", None):
                raise TypeError(
                    f"Cannot extend csp.Enum {base.__name__!r}: inheriting "
                    "from an Enum is prohibited"
                )
        metadata: dict[str, int] = {}
        last = -1
        for k, v in dct.items():
            if k == "auto":  # the Enum.auto marker attribute itself
                continue
            if v is auto or isinstance(v, auto):
                v = last + 1
            elif (k.startswith("_") and k.endswith("_")) or callable(v) or isinstance(
                v, (property, classmethod, staticmethod)
            ):
                continue
            if not isinstance(v, int) or isinstance(v, bool):
                raise TypeError(
                    f"csp.Enum expected int enum value, got "
                    f"{type(v).__name__} for field {k}"
                )
            metadata[k] = v
            last = v
        dct["__metadata__"] = metadata
        cls = super().__new__(mcs, name, bases, dict(dct))
        # replace raw ints with singleton instances
        cls._by_name, cls._by_value = {}, {}
        for k, v in metadata.items():
            inst = object.__new__(cls)
            inst._name, inst._value = k, v
            setattr(cls, k, inst)
            cls._by_name[k] = inst
            cls._by_value.setdefault(v, inst)
        return cls

    def __call__(cls, value):
        """Enum(value) → member by int value (reference PyCspEnum)."""
        if isinstance(value, cls):
            return value
        if isinstance(value, int) and not isinstance(value, bool):
            try:
                return cls._by_value[value]
            except KeyError:
                raise ValueError(f"{value} is not a valid {cls.__name__}") from None
        if isinstance(value, str):
            return cls[value]
        raise ValueError(f"Cannot convert value to enum: {value!r}")

    def __getitem__(cls, name: str):
        try:
            return cls._by_name[name]
        except KeyError:
            raise KeyError(f"{name} is not a member of {cls.__name__}") from None

    def __iter__(cls) -> Iterator["Enum"]:
        return iter(cls._by_name.values())

    @property
    def __members__(cls) -> Mapping[str, "Enum"]:
        return dict(cls._by_name)


class Enum(metaclass=EnumMeta):
    auto = auto

    @property
    def name(self) -> str:
        return self._name

    @property
    def value(self) -> int:
        return self._value

    def __repr__(self) -> str:
        return f"<{type(self).__name__}.{self._name}: {self._value}>"

    def __str__(self) -> str:
        return f"{type(self).__name__}.{self._name}"

    def __hash__(self) -> int:
        return hash((type(self).__name__, self._value))

    def __eq__(self, other) -> bool:
        return isinstance(other, type(self)) and other._value == self._value

    def __reduce__(self):
        return type(self), (self._value,)

    # ---- Spark column mapping (codegen-side, no UDF) -----------------

    @classmethod
    def code_to_name(cls, code: Column) -> Column:
        """Int-code column → name string column via a literal map."""
        pairs = []
        for k, v in cls.__metadata__.items():
            pairs.extend((F.lit(v), F.lit(k)))
        return F.element_at(F.create_map(*pairs), code.cast("int"))

    @classmethod
    def name_to_code(cls, name: Column) -> Column:
        """Name string column → int code column."""
        pairs = []
        for k, v in cls.__metadata__.items():
            pairs.extend((F.lit(k), F.lit(v)))
        return F.element_at(F.create_map(*pairs), name)


def DynamicEnum(  # noqa: N802 — reference-parity name (csp/impl/enum.py:111)
    name: str,
    values: Union[Mapping[str, int], Sequence[str]],
    start: int = 0,
    module_name: str | None = None,
):
    """Create an Enum type at runtime from a dict of name→value or a
    list of names (numbered from ``start``)."""
    if not isinstance(values, Mapping):
        values = {k: i + start for i, k in enumerate(values)}
    else:
        values = dict(values)
    if module_name is None:
        frame = inspect.currentframe()
        module_name = frame.f_back.f_globals.get("__name__", __name__)
    dct = dict(values)
    dct["__module__"] = module_name
    return EnumMeta(name, (Enum,), dct)
