"""csp.adapters.kafka parity — the class-shaped ``KafkaAdapterManager``
(reference csp/adapters/kafka.py:39-240) over the functional
Structured Streaming source/sink (:func:`kafka_ticks` /
:func:`publish_kafka_stream`).

Reference shape: one manager = one broker + consumer/producer config;
``subscribe(ts_type, msg_mapper, topic, key, ...)`` returns a typed
edge per (topic, key); ``publish(msg_mapper, topic, key, x)`` writes a
struct stream back; ``status()`` is the adapter's status edge.

Spark mapping: subscribe builds ``spark.readStream.format("kafka")``
with the manager's config translated to source options —
``start_offset`` becomes startingOffsets/startingTimestamp, rd_kafka
conf pass through as ``kafka.*`` options — and the MsgMapper's decode
is a pure Catalyst expression over the value column (no per-row
Python). The result carries the engine's (key, ts, seq, value) tick
columns with ``seq`` = the Kafka partition offset, the reference's own
per-adapter ordering guarantee.

The decode/field-map/meta-map plan is IDENTICAL for a batch DataFrame
with the Kafka wire schema (key/value binary, topic, partition,
offset, timestamp) — tests inject one through ``source_df`` and the
same expressions run without a broker; production omits it and gets
the real readStream.
"""

from __future__ import annotations

import datetime as _dt
import typing
from enum import IntEnum

from ..sinks.publish import publish_kafka_stream
from ..streaming.sources import kafka_ticks

# module-level mapper re-exports (reference kafka.py:11-19 — user code
# like examples/03_using_adapters/kafka/e1_kafka.py imports the mapper
# family from csp.adapters.kafka, not csp.adapters.utils)
from .utils import (  # noqa: F401
    BytesMessageProtoMapper,
    DateTimeType,
    JSONTextMessageMapper,
    MsgMapper,
    RawBytesMessageMapper,
    RawTextMessageMapper,
    hash_mutable,
)

__all__ = [
    "BytesMessageProtoMapper",
    "DateTimeType",
    "JSONTextMessageMapper",
    "KafkaAdapterManager",
    "KafkaStartOffset",
    "KafkaStatusMessageType",
    "MsgMapper",
    "RawBytesMessageMapper",
    "RawTextMessageMapper",
    "kafka_ticks",
    "publish_kafka_stream",
]


class KafkaStatusMessageType(IntEnum):
    """reference kafka.py:27-32."""

    OK = 0
    MSG_DELIVERY_FAILED = 1
    MSG_SEND_ERROR = 2
    MSG_RECV_ERROR = 3
    GENERIC_ERROR = 4


def _replay_mode():
    from ..core.surface import ReplayMode

    return ReplayMode


# Backward compatible (reference kafka.py:36: KafkaStartOffset IS
# ReplayMode)
from ..core.surface import ReplayMode as KafkaStartOffset  # noqa: E402


class KafkaAdapterManager:
    """Reference calling convention (kafka.py:39): construct with the
    broker + offsets/auth config, then subscribe/publish per topic."""

    def __init__(
        self,
        broker,
        start_offset: typing.Union[
            "KafkaStartOffset", _dt.timedelta, _dt.datetime, None
        ] = None,
        group_id: str | None = None,
        group_id_prefix: str = "",
        max_threads: int = 4,
        max_queue_size: int = 1000000,
        auth: bool = False,
        security_protocol: str = "SASL_SSL",
        sasl_kerberos_keytab: str = "",
        sasl_kerberos_principal: str = "",
        ssl_ca_location: str = "",
        sasl_kerberos_service_name: str = "kafka",
        rd_kafka_conf_options: dict | None = None,
        debug: bool = False,
        poll_timeout: _dt.timedelta = _dt.timedelta(seconds=1),
        rd_kafka_consumer_conf_options: dict | None = None,
        rd_kafka_producer_conf_options: dict | None = None,
        spark=None,
        source_df=None,
    ):
        # the reference's construction rules
        if group_id is not None and start_offset is not None:
            raise ValueError(
                "start_offset is not supported when consuming with group_id"
            )
        if not group_id:
            start_offset = (
                start_offset
                if start_offset is not None
                else KafkaStartOffset.LATEST
            )
        consumer_properties = (
            rd_kafka_consumer_conf_options.copy()
            if rd_kafka_consumer_conf_options
            else {}
        )
        if {"group.id", "enable.partition.eof"}.intersection(
            consumer_properties.keys()
        ):
            raise ValueError(
                "'group.id' and 'enable.partition.eof' are not settable "
                "with rd_kafka_consumer_conf_options"
            )
        if rd_kafka_conf_options is not None and not isinstance(
            rd_kafka_conf_options, dict
        ):
            raise TypeError("rd_kafka_conf_options must be a dict")
        consumer_properties["group.id"] = group_id
        producer_properties = (
            rd_kafka_producer_conf_options.copy()
            if rd_kafka_producer_conf_options
            else {}
        )
        producer_properties["queue.buffering.max.messages"] = str(
            max_queue_size
        )
        conf_properties = {"bootstrap.servers": broker}
        if auth:
            conf_properties.update({
                "security.protocol": security_protocol,
                "sasl.kerberos.keytab": sasl_kerberos_keytab,
                "sasl.kerberos.principal": sasl_kerberos_principal,
                "sasl.kerberos.service.name": sasl_kerberos_service_name,
                "ssl.ca.location": ssl_ca_location,
            })
        if debug:
            rd_kafka_conf_options = dict(rd_kafka_conf_options or {})
            rd_kafka_conf_options["debug"] = "all"
            # deliberate reference behavior (kafka.py:126-128): debug
            # forces start_offset to None "so we dont block on pull
            # adapter and let status msgs through" — kept verbatim
            start_offset = None
        if rd_kafka_conf_options:
            conf_properties.update(rd_kafka_conf_options)
        self._group_id_prefix = group_id_prefix
        self._properties = {
            "start_offset": (
                start_offset.value
                if isinstance(start_offset, KafkaStartOffset)
                else start_offset
            ),
            "max_threads": max_threads,
            "poll_timeout": poll_timeout,
            "rd_kafka_conf_properties": conf_properties,
            "rd_kafka_consumer_conf_properties": consumer_properties,
            "rd_kafka_producer_conf_properties": producer_properties,
        }
        self._broker = broker
        self._start_offset = start_offset
        self._spark = spark
        self._source_df = source_df

    # ------------------------------------------------------- internals
    def _offset_options(self) -> dict:
        """start_offset → Spark Kafka source options. LATEST/EARLIEST
        map directly; a datetime maps to startingTimestamp (ms); a
        timedelta is an offset from the active run's starttime
        (reference semantics), resolved at subscribe time."""
        so = self._start_offset
        if so is None:
            return {}
        RM = _replay_mode()
        if isinstance(so, RM):
            if so == RM.EARLIEST:
                return {"startingOffsets": "earliest"}
            if so == RM.LATEST:
                return {"startingOffsets": "latest"}
            # START_TIME: the engine start
            from ..plans.runtime import _run_info_stack

            if _run_info_stack and _run_info_stack[-1]["start"]:
                so = _run_info_stack[-1]["start"]
            else:
                return {"startingOffsets": "earliest"}
        if isinstance(so, _dt.timedelta):
            from ..plans.runtime import _run_info_stack

            if not (_run_info_stack and _run_info_stack[-1]["start"]):
                raise RuntimeError(
                    "timedelta start_offset needs a run() starttime"
                )
            so = _run_info_stack[-1]["start"] + so
        if isinstance(so, _dt.datetime):
            ms = int(so.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000) \
                if so.tzinfo is None else int(so.timestamp() * 1000)
            return {"startingTimestamp": str(ms)}
        return {}

    def _raw_frame(self, topic: str):
        if self._source_df is not None:
            from pyspark.sql import functions as F

            return self._source_df.filter(F.col("topic") == topic)
        from ..core.session import get_spark

        spark = self._spark or get_spark()
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self._broker)
            .option("subscribe", topic)
        )
        for k, v in self._offset_options().items():
            reader = reader.option(k, v)
        # rd_kafka conf passes through under Spark's kafka. prefix
        for k, v in self._properties["rd_kafka_conf_properties"].items():
            if k != "bootstrap.servers":
                reader = reader.option(f"kafka.{k}", str(v))
        return reader.load()

    # ------------------------------------------------------- subscribe
    def subscribe(
        self,
        ts_type: type,
        msg_mapper,
        topic,
        key=None,
        field_map: typing.Union[dict, str, None] = None,
        meta_field_map: dict | None = None,
        push_mode=None,
        adjust_out_of_order_time: bool = False,
        tick_timestamp_from_field: str | None = None,
        include_msg_before_start_time: bool = True,
    ):
        """Typed edge for one (topic, key). ``key=None`` subscribes to
        every message on the topic (reference wildcard mode). Field
        mapping and metadata mapping are Catalyst expressions over the
        decoded payload (reference kafka.py:137-191)."""
        from pyspark.sql import functions as F

        from ..core.record import Struct
        from ..core.ticks import KEY, SEQ, TS, VALUE, TickStream

        meta_field_map = meta_field_map or {}
        if tick_timestamp_from_field is not None and meta_field_map.get(
            "timestamp"
        ) == tick_timestamp_from_field:
            raise ValueError(
                f"Field '{tick_timestamp_from_field}' cannot be used for "
                "both timestamp extraction and meta field mapping"
            )
        if isinstance(field_map, str):
            field_map = {field_map: ""}
        is_struct = isinstance(ts_type, type) and issubclass(ts_type, Struct)
        if not field_map and is_struct:
            field_map = {f: f for f in ts_type.__metadata__}

        raw = self._raw_frame(topic)
        if key is not None:
            raw = raw.filter(F.col("key").cast("string") == str(key))
        _SCALAR_DDL = {float: "double", int: "long", bool: "boolean",
                       str: "string"}
        if is_struct:
            # the decode schema describes the WIRE message: field_map
            # KEYS typed by the struct field each maps to (a renaming
            # field_map parses the wire names, not the struct names)
            st = ts_type.spark_type()
            schema = ", ".join(
                f"`{m}` {st[sf or m].dataType.simpleString()}"
                for m, sf in (field_map or {}).items()
            )
        elif field_map and ts_type in _SCALAR_DDL:
            # scalar form: one wire field, typed by ts_type
            fld = next(iter(field_map))
            schema = f"`{fld}` {_SCALAR_DDL[ts_type]}"
        else:
            schema = None
        decoded = msg_mapper.decode(F.col("value"), schema)

        _META = {
            "partition": F.col("partition"),
            "offset": F.col("offset"),
            "live": F.lit(True),
            "timestamp": F.col("timestamp"),
            "key": F.col("key").cast("string"),
        }
        if is_struct:
            parts = {}
            for msg_field, struct_field in (field_map or {}).items():
                parts[struct_field or msg_field] = decoded[msg_field]
            for meta, struct_field in meta_field_map.items():
                if meta not in _META:
                    raise ValueError(f"unsupported meta field: {meta}")
                parts[struct_field] = _META[meta]
            value = F.struct(*[c.alias(n) for n, c in parts.items()])
        else:
            # scalar edge: str field_map {field: ""} picks one payload
            # field out of the parsed wire struct; raw mappers cast the
            # whole payload to ts_type
            if field_map and schema is not None:
                value = decoded[next(iter(field_map))]
            elif ts_type in _SCALAR_DDL:
                value = decoded.cast(_SCALAR_DDL[ts_type])
            else:
                value = decoded
        ts_expr = (
            decoded[tick_timestamp_from_field].cast("timestamp")
            if tick_timestamp_from_field
            else F.col("timestamp")
        )
        if adjust_out_of_order_time:
            # sim-replay monotonic clamp: running max over the offset
            # order; streaming mode keeps source time (the reference
            # flag also only applies during sim replay)
            from pyspark.sql import Window

            if not raw.isStreaming:
                w = (
                    Window.partitionBy("partition")
                    .orderBy("offset")
                    .rowsBetween(Window.unboundedPreceding, 0)
                )
                ts_expr = F.max(ts_expr).over(w)
        out = raw.select(
            F.col("key").cast("string").alias(KEY),
            ts_expr.alias(TS),
            F.col("offset").alias(SEQ),
            value.alias(VALUE),
        )
        if not include_msg_before_start_time:
            from ..plans.runtime import _run_info_stack

            if _run_info_stack and _run_info_stack[-1]["start"]:
                out = out.filter(
                    F.col(TS) >= F.lit(_run_info_stack[-1]["start"])
                )
        stream = TickStream(out)
        from ..core.surface import PushMode

        if (
            push_mode is not None
            and push_mode == PushMode.LAST_VALUE
            and not raw.isStreaming
        ):
            from ..operators.baselib import last_value

            return last_value(stream)
        return stream

    # --------------------------------------------------------- publish
    def publish(
        self,
        msg_mapper,
        topic: str,
        key,
        x,
        field_map: typing.Union[dict, str, None] = None,
        checkpoint_dir: str | None = None,
    ):
        """Publish a struct edge back to Kafka (reference
        kafka.py:192-240): ``key`` names the struct field (or nested
        field path list) used as the message key; the payload is the
        JSON of the (field-mapped) struct."""
        from pyspark.sql import functions as F

        from ..core.ticks import VALUE

        df = x.df if hasattr(x, "df") else x
        if isinstance(field_map, str):
            field_map = {"": field_map}
        v = F.col(VALUE)
        key_col = (
            v[key]
            if isinstance(key, str)
            else _nested_field(v, key)
        )
        payload = v
        if field_map:
            names = [f.name for f in df.schema[VALUE].dataType.fields]
            payload = F.struct(*[
                v[n].alias(field_map.get(n, n)) for n in names
            ])
        key_expr = key_col.cast("string").alias("key")
        value_expr = F.to_json(payload).alias("value")
        if not df.isStreaming:
            # batch form: the wire frame, assertable in tests. When the
            # input is a tick frame it also carries the broker-side
            # meta a real produce would create (timestamp = produce
            # time = the tick time, offset = the per-partition
            # sequence = SEQ) so a source_df seam round trip is
            # lossless; a plain value-only DataFrame (also legal here)
            # keeps the bare key/value shape. The kafka SINK columns
            # stay key/value (the streaming branch keeps only those).
            from ..core.ticks import SEQ, TS

            meta = []
            if TS in df.columns and SEQ in df.columns:
                meta = [F.col(TS).alias("timestamp"),
                        F.col(SEQ).alias("offset")]
            return df.select(key_expr, value_expr, *meta)
        out = df.select(key_expr, value_expr)
        import tempfile

        return (
            out.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", self._broker)
            .option("topic", topic)
            .option(
                "checkpointLocation",
                checkpoint_dir or tempfile.mkdtemp(prefix="csp_kafka_ckpt_"),
            )
            .start()
        )

    def status(self, push_mode=None):
        from ..impl.wiring.adapters import status_adapter_def

        return status_adapter_def(self)

    # ----------------------------------------------------- identity
    def __hash__(self):
        from .utils import hash_mutable

        return hash((self._group_id_prefix, hash_mutable(self._properties)))

    def __eq__(self, other):
        return (
            isinstance(other, KafkaAdapterManager)
            and self._group_id_prefix == other._group_id_prefix
            and self._properties == other._properties
        )


def _nested_field(col, path):
    for p in path:
        col = col[p]
    return col


# reference-parity module-scope TypeVars: ported programs do
# `from csp.adapters.kafka import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
