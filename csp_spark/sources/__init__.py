from .parquet import read_table, subscribe
from .other import (
    AdapterManager,
    PullInputAdapter,
    from_arrow,
    from_pull_adapter,
    py_pull_adapter_def,
    read_csv,
    read_jdbc,
    record_batch_pull,
    record_batches_to_struct,
)
from .random_gen import poisson_timer, brownian_motion
