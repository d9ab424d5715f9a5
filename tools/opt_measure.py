"""Optimization-round measurement harness (guide §1).

Two modes:

  python tools/opt_measure.py plans <out_dir> [names...]
      Write .explain("formatted") for each bench query (or the given
      names) to <out_dir>/<name>_<suffix>.txt. Suffix via $OPT_SUFFIX
      (default "before").

  python tools/opt_measure.py time <name> [reps]
      Isolated timing of one query: fresh plan each rep, timed to the
      noop sink (computes every column, §1.4), job-labelled (§1.5).
      Prints per-rep seconds. The FIRST rep in the session is the
      cold-plan number (codegen/JIT included), later reps are warm.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (local[N]).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from csp_spark import get_spark


def _spark():
    spark = get_spark(app_name="csp_spark_opt_measure",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warmup(spark, sf_dir):
    # same untimed warm-up as bench.py: JVM codegen + Python workers
    from pyspark.sql import functions as F

    from csp_spark.sources import read_table

    li = read_table(spark, f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").agg(F.sum("l_quantity")).count()
    spark.range(1000).groupBy((F.col("id") % 8).alias("g")).applyInPandas(
        lambda pdf: pdf, schema="id long"
    ).count()


def mode_plans(out_dir: str, names: list[str]) -> None:
    import contextlib
    import io

    from bench import BENCH_QUERIES, COMPARABLE_R8

    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = os.environ.get("OPT_SUFFIX", "before")
    from bench import EXTRA_QUERIES

    spark = _spark()
    qs = E.queries()
    targets = names or list(dict.fromkeys(BENCH_QUERIES + COMPARABLE_R8))
    for name in targets:
        fn = EXTRA_QUERIES.get(name) or qs[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


def mode_time(name: str, reps: int) -> None:
    from bench import EXTRA_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    _warmup(spark, sf_dir)
    fn = EXTRA_QUERIES.get(name) or E.queries()[name]
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{name} rep{i}: {dt:.3f}s")
    spark.sparkContext.setJobDescription(None)


def mode_ab(names: list[str], rounds: int) -> None:
    """Interleaved A/B/...: alternate the named queries within ONE
    session for `rounds` rounds. The box's speed drifts by 2-3x over
    minutes (hypervisor noise), so only within-round ratios are
    trustworthy; report per-round times and the median ratio vs the
    first name."""
    import statistics

    from bench import EXTRA_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    _warmup(spark, sf_dir)
    qs = E.queries()
    fns = {n: EXTRA_QUERIES.get(n) or qs[n] for n in names}
    times: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        for n in names:
            spark.sparkContext.setJobDescription(f"ab {n} r{r}")
            t0 = time.perf_counter()
            fns[n](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            times[n].append(time.perf_counter() - t0)
        print("round", r, {n: round(times[n][-1], 3) for n in names})
    base = names[0]
    for n in names[1:]:
        ratios = [b / a for a, b in zip(times[base], times[n])]
        print(f"median {n}/{base} ratio: "
              f"{statistics.median(ratios):.3f}")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "plans":
        mode_plans(sys.argv[2], sys.argv[3:])
    elif mode == "time":
        mode_time(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif mode == "ab":
        mode_ab(sys.argv[2].split(","), int(sys.argv[3]) if len(sys.argv) > 3 else 4)
    else:
        raise SystemExit(f"unknown mode {mode}")
