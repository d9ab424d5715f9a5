from .publish import (
    publish_parquet,
    publish_struct,
    publish_csv,
    publish_kafka_stream,
    publish_parquet_stream,
    print_ticks,
    log_ticks,
    write_record_batches,
    stop_engine_limit,
)
