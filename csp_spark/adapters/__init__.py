"""csp.adapters namespace parity (reference csp/adapters/*).

Maps each reference adapter module to this engine's Spark-native
implementation so `from csp.adapters.parquet import ...` ports become
`from csp_spark.adapters.parquet import ...`:

| reference (csp/adapters/) | here |
|---|---|
| parquet.py ParquetReader/Writer | .parquet (sources/parquet.py, sinks/publish.py) |
| csv.py CSVReader/Writer | .csv (sources/other.py, sinks/publish.py) |
| db.py DBReader | .db (sources/other.py read_jdbc — Spark JDBC) |
| arrow.py RecordBatch in/out | .arrow (sources/other.py, sinks/publish.py) |
| kafka.py KafkaAdapterManager | .kafka (streaming/sources.py + sinks/publish.py) |
| websocket.py WebsocketAdapterManager | .websocket (streaming/sources.py socket_ticks / PushAdapter) |
| status.py Status/Level | .status (+ StreamingQuery health bridge) |
| utils.py MsgMapper family | .utils (declarative value-decode expressions) |
| slack.py / symphony.py | .slack / .symphony (same external-package shim as the reference + a minimal injectable-sender publish path) |
| perspective.py | out of scope (UI; SURVEY §2.2) |

These are thin namespaces, not re-implementations — the underlying
functions are the same objects as in csp_spark.sources / .sinks /
.streaming.
"""

from . import arrow, csv, db, kafka, parquet, perspective, slack, status, symphony, utils, websocket, websocket_table, websocket_types

__all__ = [
    "parquet", "csv", "db", "arrow", "kafka", "websocket", "status", "utils",
]
