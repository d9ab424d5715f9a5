"""Training-data pipeline utilities beyond dedup/similarity/text:
deterministic splits and samples (sampling.py). Part of the
LLM-pipeline mandate — no csp reference counterpart (csp is a stream
engine; corpus curation is out of its scope)."""

from .dsir import dsir_select, dsir_weights  # noqa: F401
from .packing import (  # noqa: F401
    pack_next_fit,
    pack_offsets,
    pack_stats,
    sequence_manifest,
)
from .sampling import (  # noqa: F401
    cap_per_group,
    deterministic_sample,
    hash_split,
    leakage_safe_split,
    mix_to_budget,
    repeat_to_budget,
    split_uniform,
    stratified_sample,
    weighted_sample,
)
from .storage import (  # noqa: F401
    exchanges_in_plan,
    load_tick_stream,
    save_tick_stream,
    write_training_shards,
    write_bucketed_table,
)
