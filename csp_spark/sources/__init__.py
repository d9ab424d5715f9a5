from .parquet import read_table, subscribe
from .other import read_csv, read_jdbc, from_arrow
from .random_gen import poisson_timer, brownian_motion
