"""csp.adapters.parquet parity: ParquetReader.subscribe / ParquetWriter
(reference csp/adapters/parquet.py) over Spark's vectorized parquet
scan + writer."""
from ..sources.parquet import read_table, subscribe
from ..sinks.publish import publish_parquet, publish_parquet_stream

__all__ = ["read_table", "subscribe", "publish_parquet", "publish_parquet_stream"]
