"""Local mirror of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB at sf0.01, compare row count + schema + order-insensitive
values. Usage: python tools/check_correctness.py [sf_dir] [names...]"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as E
from csp_spark import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Mirror the driver: raw-value hashing distinguishes -0.0 from
        # +0.0 (r2 stats_ema_cov failed on exactly this), so canon must
        # keep them distinct too.
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    # ANSI ON to mirror the driver's session (Spark 4 default): r2's
    # dedup_minhash ARITHMETIC_OVERFLOW passed locally only because this
    # gate ran ANSI-off. Queries must be correct under BOTH modes.
    spark = get_spark(
        app_name="correctness",
        **{
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.ansi.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {ex}")
            failures.append(name)
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(drows)}")
            ok = False
        else:
            sset, dset = rowset(srows, scols), rowset(drows, dcols)
            if sset != dset:
                diffs = [
                    (a, b) for a, b in zip(sset, dset) if a != b
                ][:3]
                print(f"FAIL  {name}: value mismatch, e.g. {diffs}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(srows)} rows")
        else:
            failures.append(name)
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
