"""Property-based invariants over the baselib operators (hypothesis).

The reference's test suite leans on randomized data against algebraic
identities (csp/tests/test_baselib.py style); these mirror that with
generated tick streams. Examples are kept small — every example runs
real Spark jobs.
"""

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from csp_spark import KEY, SEQ, TS, VALUE, TickStream
from csp_spark.operators import baselib as bl

import pytest

START = dt.datetime(2021, 1, 1)
SCHEMA = "key string, ts timestamp, seq long, value double"

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=40),  # seconds offset; ties allowed
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=20,
)


def _mk(spark, rows):
    # seq disambiguates ties in generation order — the engine-cycle rule
    data = [
        (k, START + dt.timedelta(seconds=s), i, float(v))
        for i, (k, s, v) in enumerate(rows)
    ]
    return TickStream(spark.createDataFrame(data, SCHEMA)), data


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_split_partitions_stream(spark, rows):
    x, data = _mk(spark, rows)
    flag = TickStream(
        x.df.select(KEY, TS, SEQ, (F.col(VALUE) > 0).alias(VALUE)), VALUE
    )
    t, f = bl.split(flag, x)
    assert t.df.count() + f.df.count() == len(data)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_drop_dups_idempotent(spark, rows):
    x, _ = _mk(spark, rows)
    once = bl.drop_dups(x)
    twice = bl.drop_dups(once)
    a = sorted(tuple(r) for r in once.df.collect())
    b = sorted(tuple(r) for r in twice.df.collect())
    assert a == b


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_diff_of_accum_recovers_values(spark, rows):
    x, data = _mk(spark, rows)
    acc = bl.accum(x)
    rec = bl.diff(acc, 1)
    got = {(r[KEY], r[TS], r[SEQ]): r[VALUE] for r in rec.df.collect()}
    # per key, every tick after the first must recover the original value
    seen: dict[str, int] = {}
    for k, ts, seq, v in sorted(data, key=lambda r: (r[0], r[1], r[2])):
        if k in seen:
            assert math.isclose(got[(k, ts, seq)], v, abs_tol=1e-9)
        seen[k] = seen.get(k, 0) + 1


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_firstn_counts(spark, rows):
    x, data = _mk(spark, rows)
    n = 3
    per_key: dict[str, int] = {}
    for k, *_ in rows:
        per_key[k] = per_key.get(k, 0) + 1
    got = bl.firstN(x, n).df.count()
    assert got == sum(min(n, c) for c in per_key.values())


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_merge_left_wins_on_ties(spark, rows):
    x, data = _mk(spark, rows)
    y = TickStream(x.df.select(KEY, TS, SEQ, (F.col(VALUE) + 1000).alias(VALUE)))
    m = bl.merge(x, y)
    # every (key, ts, seq) collides -> left always wins, count preserved
    got = m.df.collect()
    assert len(got) == len(data)
    assert all(r[VALUE] < 1000 for r in got)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_unroll_of_burst_preserves_multiset(spark, rows):
    x, data = _mk(spark, rows)
    rt = bl.unroll(bl.burst(x))
    got = sorted((r[KEY], r[TS], r[VALUE]) for r in rt.df.collect())
    exp = sorted((k, ts, v) for k, ts, _s, v in data)
    assert got == exp
