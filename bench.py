"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan build + execution to a driver-side
count-style action). Before timing, one small untimed warm-up runs: a
trivial scan-aggregate plus a trivial pandas-UDF exchange, so the first
timed query doesn't absorb one-time JVM/codegen/Python-worker startup
(which a long-lived engine amortizes away).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from csp_spark import get_spark

# Headline set: relational joins/aggs, window/tick-stream pipeline,
# rolling stats, EMA (applyInPandas path), text, dedup (MinHash at
# scale; the O(n^2)-prone exact-jaccard variant is excluded from the
# bench set), ANN. Everything else in queries() is exercised by the
# correctness gate; the bench set is the performance-representative core.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q9_product_profit",
    "q21_suppliers_kept_waiting",
    "op_count",
    "op_sample_asof",
    "stats_rolling_tick",
    "stats_rolling_time",
    "stats_expanding",
    "stats_quantile",
    "stats_ema",
    "text_stats",
    "dedup_exact",
    "dedup_minhash",
    "dedup_components",
    "doc_split",
    "ann_topk",
    "ann_knn_join",
    "ann_knn_join_blas",
    "op_windowed_global",
    "doc_pack",
    "doc_pack_fit",
    "doc_repeated_spans",
    "text_lm_score",
]
# Queries added to the bench set after round 2 — totals are NOT
# comparable across rounds without excluding these, so the comparable
# subtotal is COMPUTED below and emitted as its own JSON field (the
# hand-written r3 note understated the subtotal; never do arithmetic
# in prose that the JSON can do itself).
ADDED_R3 = {
    "dedup_components", "doc_split", "ann_knn_join", "ann_knn_join_blas",
    "q9_product_profit", "q21_suppliers_kept_waiting",
}
ADDED_R4 = {"op_windowed_global", "doc_pack", "doc_pack_fit",
            "doc_repeated_spans", "text_lm_score"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark(app_name="csp_spark_bench",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warm-up: JVM codegen paths + Python UDF workers
    from pyspark.sql import functions as F
    from csp_spark.sources import read_table

    li = read_table(spark, f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").agg(F.sum("l_quantity")).count()
    spark.range(1000).groupBy((F.col("id") % 8).alias("g")).applyInPandas(
        lambda pdf: pdf, schema="id long"
    ).count()

    qs = E.queries()
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    total = 0.0
    warm_total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt_ = time.perf_counter() - t0
        timings[name] = round(dt_, 3)
        total += dt_
        # second, warm run of the SAME plan: steady-state throughput
        # with codegen/JIT/broadcasts amortized (what a long-lived
        # engine sees). The cold number stays the headline for
        # cross-round comparability.
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wt = time.perf_counter() - t0
        warm[name] = round(wt, 3)
        warm_total += wt
        print(f"# {name}: {dt_:.3f}s cold / {wt:.3f}s warm ({n} rows)",
              file=sys.stderr)

    added = ADDED_R3 | ADDED_R4
    comparable_r2 = round(
        sum(t for n, t in timings.items() if n not in added), 3
    )
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "value_warm": round(warm_total, 3),
        "sf": sf,
        # computed, not hand-written: the 16-query subtotal comparable
        # to the r2 bench set (r2 total was 28.8s; r3's computed value
        # of this field was 25.6s)
        "comparable_r2_subtotal": comparable_r2,
        "added_since_r2": sorted(added),
        # each query is timed on its FIRST run in a fresh session, so
        # numbers include one-time codegen/JIT per distinct plan —
        # measured dedup_exact: 4.0s first run, 0.6s warm (same plan)
        "notes": "queries/value are cold-plan timings (first run per "
                 "session, comparable with earlier rounds); queries_warm/"
                 "value_warm re-run the same plan warm (codegen/JIT/"
                 "broadcast amortized steady state). "
                 "comparable_r2_subtotal excludes the queries listed in "
                 "added_since_r2 (added after round 2) and is computed "
                 "from the per-query cold timings in this JSON.",
    }))


if __name__ == "__main__":
    main()
