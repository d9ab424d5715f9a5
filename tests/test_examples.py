"""Example smoke tests — the reference's csp/tests/test_examples.py
pattern: every runnable example executes end-to-end (each example
carries its own value asserts, so a pass is a behavioral check, not
just an import). Examples share the session-singleton get_spark()."""

import pytest

from tests.conftest import load_module

EXAMPLES = [
    "01_spread",
    "02_dedup_pipeline",
    "03_realtime",
    "04_curation_pipeline",
    "05_hybrid_replay_live",
    "06_pandas_edges",
    "07_reference_api_tour",
    "08_ann_retrieval",
    "09_imperative_nodes",
    "10_reference_verbatim",
    "11_live_table",
    "12_incremental_refresh",
    "13_class_adapters",
    "14_streaming_alarms",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    load_module(f"examples/{name}.py", f"ex_{name}").main()
