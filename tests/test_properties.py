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


# ---------------------------------------------------------------- round 4


@given(
    rows=rows_strategy,
    window=st.integers(min_value=1, max_value=8),
    nparts=st.sampled_from([1, 3, 9]),
)
@settings(**_SETTINGS)
def test_windowed_unkeyed_equals_bruteforce(spark, rows, window, nparts):
    """Tail-replication windowed sums/counts equal a Python brute force
    over the engine-ordered stream, for any window/partitioning —
    covering both the replicated and fallback plans."""
    from csp_spark.core.unkeyed import windowed_unkeyed

    x, data = _mk(spark, rows)
    got = {r["seq"]: (r["win_sum"], r["win_count"], r["win_min"], r["win_max"])
           for r in windowed_unkeyed(
               x, window, aggs=["sum", "count", "min", "max"],
               num_partitions=nparts).collect()}
    ordered = sorted(data, key=lambda r: (r[1], r[2]))
    for i, (_k, _t, seq, _v) in enumerate(ordered):
        frame = [r[3] for r in ordered[max(0, i - window + 1): i + 1]]
        s, c, mn, mx = got[seq]
        assert c == len(frame)
        assert math.isclose(s, sum(frame), abs_tol=1e-6)
        assert mn == min(frame) and mx == max(frame)


@given(rows=rows_strategy, init=st.floats(-10, 10, allow_nan=False))
@settings(**_SETTINGS)
def test_feedback_scan_equals_python_fold(spark, rows, init):
    """Per-cycle feedback equals the sequential per-key Python fold for
    a nonlinear update, for any generated stream and init."""
    from csp_spark import feedback_scan

    x, data = _mk(spark, rows)
    fn = lambda v, prev: max(min(0.7 * prev + 0.3 * v, 50.0), -50.0)  # noqa: E731
    got = {r["seq"]: r["value"] for r in feedback_scan(x, fn, init=init).df.collect()}
    prevs: dict = {}
    for k, t, seq, v in sorted(data, key=lambda r: (r[1], r[2])):
        prevs[k] = fn(v, prevs.get(k, init))
        assert math.isclose(got[seq], prevs[k], rel_tol=1e-12), seq


@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=300), min_size=1, max_size=6
    ),
    sizes=st.sampled_from([1, 7, 126, 65536]),
)
@settings(max_examples=20, deadline=None)
def test_websocket_frame_roundtrip_fuzz(payloads, sizes):
    """RFC 6455 framing: arbitrary payloads survive encode→parse with
    and without masking, across the 7/16/64-bit length encodings and
    arbitrary fragmentation points (no Spark involved)."""
    from csp_spark.streaming.websocket import (
        OP_CONT, OP_TEXT, _parse_frame, encode_frame,
    )

    for payload in payloads:
        padded = payload + b"x" * sizes  # push across length encodings
        for mask in (True, False):
            wire = encode_frame(OP_TEXT, padded, mask=mask)
            pos = [0]

            def rd(n):
                out = wire[pos[0]:pos[0] + n]
                pos[0] += n
                return out

            fin, op, got = _parse_frame(rd)
            assert fin and op == OP_TEXT and got == padded
        # fragmentation at an arbitrary cut: two frames reassemble
        cut = len(padded) // 3
        w1 = encode_frame(OP_TEXT, padded[:cut], mask=True, fin=False)
        w2 = encode_frame(OP_CONT, padded[cut:], mask=True, fin=True)
        stream = w1 + w2
        pos = [0]

        def rd2(n):
            out = stream[pos[0]:pos[0] + n]
            pos[0] += n
            return out

        fin1, op1, p1 = _parse_frame(rd2)
        fin2, op2, p2 = _parse_frame(rd2)
        assert not fin1 and op1 == OP_TEXT
        assert fin2 and op2 == OP_CONT and p1 + p2 == padded


@given(
    sigs=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2, max_size=12, unique=True,
    ),
    max_hamming=st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_hamming_pairs_exact_recall(spark, sigs, max_hamming):
    """The pigeonhole bucket join must find EXACTLY the pairs within
    max_hamming bits — 100% recall (the structural guarantee) and no
    false positives (the verification filter)."""
    from csp_spark.dedup import hamming_pairs

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "id long, sig long"
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in hamming_pairs(df, max_hamming=max_hamming).collect()}
    want = {}
    for i, a in enumerate(sigs):
        for j in range(i + 1, len(sigs)):
            d = bin((a ^ sigs[j]) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                want[(i, j)] = d
    assert got == want


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=5,
    ),
    k=st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_repeated_spans_equals_bruteforce(spark, texts, k):
    """repeated_spans == a brute-force Python census + interval merge
    on arbitrary tiny corpora (within-doc repeats, cross-doc repeats,
    docs shorter than k)."""
    from csp_spark.text import repeated_spans

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(docs, k=k).collect()
    )

    from collections import defaultdict
    occ = defaultdict(list)
    for i, t in enumerate(texts):
        for p in range(len(t) - k + 1):
            occ[tuple(t[p:p + k])].append((i, p + 1))
    marked = defaultdict(list)
    for g, places in occ.items():
        if len(places) < 2:
            continue
        keep = min(places)
        for pl in places:
            if pl != keep:
                marked[pl[0]].append(pl[1])
    want = []
    for i, ps in marked.items():
        ps.sort()
        s, e = ps[0], ps[0] + k
        for p in ps[1:]:
            if p <= e:
                e = max(e, p + k)
            else:
                want.append((i, s, e))
                s, e = p, p + k
        want.append((i, s, e))
    assert got == sorted(want)


@given(
    vals=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        min_size=8, max_size=24,
    ),
    m=st.sampled_from([2, 4]),
)
@settings(**_SETTINGS)
def test_pq_codes_select_nearest_center(spark, vals, m):
    """Every PQ code must point at the nearest codebook center of its
    subvector (the argmin contract of the distributed encoder)."""
    import numpy as np
    from csp_spark.similarity import pq_index

    dim = 4
    rows = [
        (i, [float(vals[(i * dim + j) % len(vals)]) for j in range(dim)])
        for i in range(6)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    enc, books = pq_index(emb, m=m, n_codes=3, train_cap=None)
    dsub = dim // m
    vecs = dict(rows)
    for r in enc.select("vec_id", "codes").collect():
        v = np.array(vecs[r["vec_id"]], dtype=np.float64)
        for j, code in enumerate(r["codes"]):
            sub = v[j * dsub:(j + 1) * dsub]
            d2 = ((books[j] - sub) ** 2).sum(axis=1)
            assert d2[code] <= d2.min() + 1e-9, (r, j, d2)


@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1, max_size=20,
    ),
    nkeys=st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_run_node_cumsum_equals_accum(spark, vals, nkeys):
    """Property: the imperative cumsum node equals the accum
    combinator for any tick values across any key split."""
    from csp_spark import run_node

    start = dt.datetime(2020, 1, 1)
    rows = [
        (f"k{i % nkeys}", start + dt.timedelta(seconds=i), 0, float(v))
        for i, v in enumerate(vals)
    ]
    x = TickStream(spark.createDataFrame(
        rows, "key string, ts timestamp, seq long, value double"
    ))

    def cum(c):
        c.state["s"] += c["x"]
        return c.state["s"]

    got = run_node(cum, x, state={"s": 0.0}).collect_all()
    want = bl.accum(x).collect_all()
    assert set(got) == set(want)
    for k in want:
        for (gt, gv), (wt, wv) in zip(got[k], want[k]):
            assert gt == wt and math.isclose(gv, wv, rel_tol=1e-12, abs_tol=1e-12)


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=10), min_size=1, max_size=12),
    timeout=st.integers(min_value=2, max_value=8),
)
@settings(**_SETTINGS)
def test_run_node_alarm_fires_iff_gap_exceeds_timeout(spark, gaps, timeout):
    """Property: a re-armed timeout alarm fires exactly after ticks
    whose successor gap exceeds the timeout (plus the trailing one)."""
    from csp_spark import run_node

    start = dt.datetime(2020, 1, 1)
    times, t = [], 0
    for g in gaps:
        times.append(t)
        t += g
    x = TickStream.from_rows(
        spark, [(start + dt.timedelta(seconds=s), float(s)) for s in times],
        key="k",
    )

    def watchdog(c):
        if c.ticked("alarm"):
            return -1.0
        h = c.state.get("h")
        if h is not None:
            c.cancel_alarm(h)
        c.state["h"] = c.schedule_alarm(dt.timedelta(seconds=timeout), True)
        return None

    got = [ts for ts, _ in run_node(watchdog, x, state={}).collect_ticks("k")]
    want = []
    for i, s in enumerate(times):
        nxt = times[i + 1] if i + 1 < len(times) else None
        if nxt is None or nxt - s > timeout:
            want.append(start + dt.timedelta(seconds=s + timeout))
    assert got == want


from hypothesis import example


@given(
    rows=rows_strategy,
    start_s=st.integers(min_value=1, max_value=12),
    end_s=st.integers(min_value=0, max_value=6),
    sp=st.sampled_from(["inclusive", "exclusive", "extrapolate"]),
    ep=st.sampled_from(["inclusive", "exclusive", "extrapolate"]),
)
# pinned: two ticks on the SAME timestamp — a range frame on micros
# cannot see seq, so without the _past_only element filter the first
# cycle would see its same-timestamp successor
@example(rows=[("a", 0, 0.0), ("a", 0, 1.0)], start_s=1, end_s=0,
         sp="inclusive", ep="inclusive")
@example(rows=[("a", 0, 0.0), ("a", 0, 1.0), ("a", 2, 2.0)], start_s=2,
         end_s=0, sp="extrapolate", ep="extrapolate")
@settings(**_SETTINGS)
def test_values_times_at_policies_match_python_replay(
    spark, rows, start_s, end_s, sp, ep
):
    """values_at/times_at under every TimeIndexPolicy pair equal a
    direct python replay of the reference ring-buffer rules
    (PyInputProxy computeStart/EndIndex + tail padding + boundary
    timestamp clamps), at every tick of the stream."""
    if end_s > start_s:
        start_s, end_s = end_s, start_s
    from csp_spark.operators import history as H

    x, data = _mk(spark, rows)
    S, E = dt.timedelta(seconds=-start_s), dt.timedelta(seconds=-end_s)
    got_v = {
        (r[KEY], r[TS], r[SEQ]): list(r[VALUE])
        for r in H.values_at(x, S, E, sp, ep).df.collect()
    }
    got_t = {
        (r[KEY], r[TS], r[SEQ]): list(r[VALUE])
        for r in H.times_at(x, S, E, sp, ep).df.collect()
    }

    by_key: dict = {}
    for k, ts_, seq, v in sorted(data, key=lambda r: (r[1], r[2])):
        by_key.setdefault(k, []).append((ts_, seq, v))
    for k, ticks in by_key.items():
        for now_ts, now_seq, _ in ticks:
            lo, hi = now_ts + S, now_ts + E
            past = [t for t in ticks if (t[0], t[1]) <= (now_ts, now_seq)]
            if sp == "inclusive":
                sel = [t for t in past if t[0] >= lo]
            elif sp == "exclusive":
                sel = [t for t in past if t[0] > lo]
            else:
                carry = [t for t in past if t[0] <= lo]
                sel = ([carry[-1]] if carry else []) + [
                    t for t in past if t[0] > lo
                ]
            if ep == "exclusive":
                sel = [t for t in sel if t[0] < hi]
            else:
                sel = [t for t in sel if t[0] <= hi]
            vals = [t[2] for t in sel]
            tss = [t[0] for t in sel]
            if ep == "extrapolate" and vals and tss[-1] < hi:
                vals.append(vals[-1])
                tss.append(tss[-1])
            if sp == "extrapolate" and tss and tss[0] < lo:
                tss[0] = lo
            if ep == "extrapolate" and tss and tss[-1] < hi:
                tss[-1] = hi
            keyk = (k, now_ts, now_seq)
            assert got_v[keyk] == vals, (keyk, sp, ep)
            assert got_t[keyk] == tss, (keyk, sp, ep)


@given(
    rows=rows_strategy,
    gap_s=st.sampled_from([1, 2, 5]),
)
@settings(**_SETTINGS)
def test_sessionize_matches_pure_python(spark, rows, gap_s):
    """sessionize == the pure-python last-seen-time scan on arbitrary
    tick patterns, including exact-gap boundaries (integer-second
    offsets with gap in seconds make boundary hits common): a tick at
    exactly last+gap JOINS (native session_window's closed boundary),
    strictly later splits; same-timestamp cycles share a session;
    keys never interact. Session indexes per key are 0-based and
    contiguous."""
    from csp_spark.stats import sessionize

    x, data = _mk(spark, rows)
    gap = dt.timedelta(seconds=gap_s)
    got = {(r[KEY], r[TS], r[SEQ]): r["session_idx"]
           for r in sessionize(x, gap).df.collect()}
    last: dict = {}
    want = {}
    for k, t, q, _v in sorted(data, key=lambda r: (r[0], r[1], r[2])):
        idx, lt = last.get(k, (-1, None))
        if lt is None or (t - lt) > gap:
            idx += 1
        last[k] = (idx, t)
        want[(k, t, q)] = idx
    assert got == want
    # contiguity: indexes per key form 0..max with no holes
    per_key: dict = {}
    for (k, _t, _q), i in got.items():
        per_key.setdefault(k, set()).add(i)
    for k, s in per_key.items():
        assert s == set(range(max(s) + 1)), k
