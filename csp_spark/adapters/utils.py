"""csp.adapters.utils parity (reference csp/adapters/utils.py): the
MsgMapper protocol family Kafka/websocket subscriptions use to declare
how raw message bytes decode into typed fields.

Spark mapping: a mapper is a declarative recipe that turns the source's
``value`` (binary) column into the typed value column(s) — a pure
Catalyst expression, applied inside the streaming plan (no per-row
Python). ``kafka_ticks``/``socket_ticks`` accept these via their
schema/field arguments; ``decode(col, schema)`` is the common entry.
"""
from __future__ import annotations

from enum import IntEnum

from pyspark.sql import Column
from pyspark.sql import functions as F


class DateTimeType(IntEnum):
    """reference csp/adapters/utils.py:5-10 — wire format of epoch
    timestamps inside JSON messages."""

    UNKNOWN = 0
    UINT64_NANOS = 1
    UINT64_MICROS = 2
    UINT64_MILLIS = 3
    UINT64_SECONDS = 4


def epoch_to_ts(col: Column, datetime_type: DateTimeType) -> Column:
    """Decode an integer epoch column of the given wire format to a
    timestamp (used on ts fields parsed out of JSON payloads)."""
    c = col.cast("long")
    if datetime_type == DateTimeType.UINT64_NANOS:
        # exact integer division: `/` on longs is DOUBLE division in
        # Spark, and epoch-ns (~1.6e18) exceeds 2^53 — the rounding
        # error (±128 ns) would shift values near a µs boundary into
        # the previous microsecond. DECIMAL division is exact.
        us = (c.cast("decimal(38,0)") / F.lit(1000)).cast("long")
        return F.timestamp_micros(us)
    if datetime_type == DateTimeType.UINT64_MICROS:
        return F.timestamp_micros(c)
    if datetime_type == DateTimeType.UINT64_MILLIS:
        return F.timestamp_millis(c)
    if datetime_type == DateTimeType.UINT64_SECONDS:
        return F.timestamp_seconds(c)
    raise ValueError(f"unknown DateTimeType: {datetime_type}")


class MsgMapper:
    """reference csp/adapters/utils.py:13-15: carries (msg_type,
    protocol) properties; subclasses add protocol specifics. ``decode``
    yields the typed column expression for a raw binary value column."""

    def __init__(self, msg_type: str, protocol: str):
        self.properties = {"msg_type": msg_type, "protocol": protocol}

    def decode(self, value: Column, schema: str | None = None) -> Column:
        raise NotImplementedError


class RawTextMessageMapper(MsgMapper):
    def __init__(self):
        super().__init__("TEXT_MSG", "RAW_BYTES")

    def decode(self, value: Column, schema: str | None = None) -> Column:
        return value.cast("string")


class RawBytesMessageMapper(MsgMapper):
    def __init__(self):
        super().__init__("BYTES_MSG", "RAW_BYTES")

    def decode(self, value: Column, schema: str | None = None) -> Column:
        return value.cast("binary")


class JSONTextMessageMapper(MsgMapper):
    def __init__(self, datetime_type: DateTimeType = DateTimeType.UINT64_NANOS):
        super().__init__("TEXT_MSG", "JSON")
        self.properties["datetime_type"] = datetime_type.name
        self.datetime_type = datetime_type

    def decode(
        self,
        value: Column,
        schema: str | None = None,
        ts_fields: "list[str] | None" = None,
    ) -> Column:
        """Parse the JSON payload per ``schema``; fields named in
        ``ts_fields`` (declared as integer epochs in the schema) are
        converted to timestamps using the mapper's wire format — the
        reference mapper's own datetime conversion, applied here as
        a struct rewrite in the plan."""
        if schema is None:
            raise ValueError("JSONTextMessageMapper.decode requires a schema")
        parsed = F.from_json(value.cast("string"), schema)
        if not ts_fields:
            return parsed
        from pyspark.sql.types import _parse_datatype_string

        fields = [f.name for f in _parse_datatype_string(schema).fields]
        return F.struct(
            *[
                (
                    epoch_to_ts(parsed[f], self.datetime_type)
                    if f in ts_fields
                    else parsed[f]
                ).alias(f)
                for f in fields
            ]
        )


class BytesMessageProtoMapper(MsgMapper):
    """PROTOBUF decode (reference utils.py:18-23). Spark ships
    ``from_protobuf`` (descriptor-file based); the hook is wired but
    gated on the pyspark.sql.protobuf module being importable in the
    runtime (it needs the spark-protobuf jar on the classpath)."""

    def __init__(self, proto_directory: str, proto_filename: str, proto_message: str):
        super().__init__("BYTES_MSG", "PROTOBUF")
        self.properties.update(
            proto_directory=proto_directory,
            proto_filename=proto_filename,
            proto_message=proto_message,
        )

    def decode(self, value: Column, schema: str | None = None) -> Column:
        try:
            from pyspark.sql.protobuf.functions import from_protobuf
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "protobuf decode needs the spark-protobuf package on the "
                "session classpath"
            ) from e
        import os

        desc = os.path.join(
            self.properties["proto_directory"], self.properties["proto_filename"]
        )
        return from_protobuf(value, self.properties["proto_message"], descFilePath=desc)


__all__ = [
    "BytesMessageProtoMapper",
    "DateTimeType",
    "JSONTextMessageMapper",
    "MsgMapper",
    "RawBytesMessageMapper",
    "RawTextMessageMapper",
    "epoch_to_ts",
]


def hash_mutable(obj):
    """Stable hash over mutable containers (reference utils.py:42-48):
    lists/tuples hash as ordered element hashes; dicts and sets hash
    ORDER-INSENSITIVELY (sorted by key / element hash) so that equal
    managers hash equal — the reference hashes dict insertion order,
    which breaks the hash/eq contract for managers whose __eq__
    compares dicts; hash VALUES are not API, so fixing that here is
    safe."""
    if isinstance(obj, (list, tuple)):
        return hash(tuple(hash_mutable(x) for x in obj))
    if isinstance(obj, set):
        return hash(tuple(sorted(hash_mutable(x) for x in obj)))
    if isinstance(obj, dict):
        return hash(tuple(
            (hash(k), hash_mutable(obj[k]))
            for k in sorted(obj, key=lambda x: (str(type(x)), str(x)))
        ))
    return hash(obj)
