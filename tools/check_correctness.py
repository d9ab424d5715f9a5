"""Local mirror of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB at sf0.01, compare row count + schema + order-insensitive
values. Usage: python tools/check_correctness.py [sf_dir] [names...]

Canonicalization deliberately mirrors the DRIVER's hasher, which
compares PANDAS frames (spark .toPandas() vs duckdb .df()):
- NO numeric rounding and NO integral-float collapse — r4's doc_pack
  shipped red because DuckDB's HUGEINT window-sum becomes float64 in
  pandas ("1234.0") while Spark's LONG stays int64 ("1234"), and the
  old gate's `v == int(v) -> str(int(v))` collapse hid exactly that.
- ARRAY / MAP / STRUCT output columns of oracle-backed queries FAIL
  LOUDLY here: the driver's hasher raises "unhashable type: 'list'"
  on them (r4 doc_token_ids), so they can never be graded green.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as E
from csp_spark import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon(v):
    """Type-tagged full-precision canonical string for one cell.

    int and float canon DIFFERENTLY even at equal value ("1234" vs
    "1234.0") because that is what the driver's pandas-level compare
    sees; Decimal keeps its own tag for the same reason."""
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return repr(v)
    if isinstance(v, (bool, np.bool_)):
        return f"B{int(v)}"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (list, dict, set, np.ndarray)):
        raise TypeError(f"unhashable driver type: {type(v).__name__}")
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return str(v)


def frame_rowset(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)  # driver sorts columns by name
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append("|".join(canon(v) for v in row))
    out.sort()
    return out


_NESTED = ("array", "map", "struct")


def spark_nested_cols(sdf):
    return [
        f.name for f in sdf.schema.fields
        if any(f.dataType.typeName().startswith(n) for n in _NESTED)
    ]


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
            has_oracle = name in oracles
            nested = spark_nested_cols(sdf)
            if has_oracle and nested:
                print(
                    f"FAIL  {name}: oracle-backed query returns nested "
                    f"column(s) {nested} — the driver hasher cannot hash "
                    "these (r4 doc_token_ids); emit exploded scalar rows"
                )
                failures.append(name)
                continue
            spdf = sdf.toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        if not has_oracle:
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            bad = [d[0] for d in res.description if d[1] in ("list", "dict")]
            if bad:
                print(
                    f"FAIL  {name}: oracle returns nested column(s) "
                    f"{bad} — driver-unhashable"
                )
                failures.append(name)
                continue
            dpdf = res.df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {ex}")
            failures.append(name)
            continue
        ok = True
        scols, dcols = sorted(spdf.columns), sorted(dpdf.columns)
        if scols != dcols:
            print(f"FAIL  {name}: columns {scols} vs {dcols}")
            ok = False
        elif len(spdf) != len(dpdf):
            print(f"FAIL  {name}: rowcount {len(spdf)} vs {len(dpdf)}")
            ok = False
        else:
            try:
                sset, dset = frame_rowset(spdf), frame_rowset(dpdf)
            except TypeError as ex:
                print(f"FAIL  {name}: {ex}")
                failures.append(name)
                continue
            if sset != dset:
                diffs = [
                    (a, b) for a, b in zip(sset, dset) if a != b
                ][:3]
                print(f"FAIL  {name}: value mismatch, e.g. {diffs}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(spdf)} rows")
        else:
            failures.append(name)
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
