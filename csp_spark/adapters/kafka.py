"""csp.adapters.kafka parity (reference csp/adapters/kafka.py
KafkaAdapterManager): Structured Streaming Kafka source/sink."""
from ..streaming.sources import kafka_ticks
from ..sinks.publish import publish_kafka_stream

__all__ = ["kafka_ticks", "publish_kafka_stream"]
