from .parquet import read_table, subscribe
