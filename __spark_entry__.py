"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md
§2 through the csp_spark library; ``oracle_sql()`` gives the DuckDB
equivalent. Floating-point determinism policy: large aggregates route
through DECIMAL casts on BOTH sides (exact, association-independent);
bounded statistics are rounded identically (6 dp) on both sides;
pure per-row arithmetic (diff/sample/delay) is emitted raw — IEEE ops
on identical inputs are bit-identical across engines.

Timestamps: events.parquet carries TIMESTAMP(NANOS); both engines
truncate to µs (DuckDB's TIMESTAMP is µs; our sources.read_table
converts), so ts values and window membership agree exactly.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csp_spark import TickStream
from csp_spark.core.ticks import KEY, SEQ, TS
from csp_spark.operators import baselib as bl
from csp_spark.sources import read_table
from csp_spark.stats import Rolling, RollingPair, ema
from csp_spark import dedup as DD
from csp_spark import text as TX
from csp_spark.similarity import cosine_topk, lsh_topk


# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, f"{sf_dir}/{name}.parquet")


def _events_stream(
    spark: SparkSession, sf_dir: str, event_type: str | None = None
) -> TickStream:
    df = _t(spark, sf_dir, "events")
    if event_type is not None:
        df = df.filter(F.col("event_type") == event_type)
    return TickStream.from_table(
        df, ts_col="ts", value_col="value", key_col="user_id", seq_col="event_id"
    )


def _out(x: TickStream, value_name: str = "value") -> DataFrame:
    """(key, ts, seq, value) → (event_id, user_id, <value_name>)."""
    return x.df.select(
        F.col(SEQ).alias("event_id"),
        F.col(KEY).cast("long").alias("user_id"),
        F.col(x.value_col).alias(value_name),
    )


_DEC = "decimal(28,10)"


def _dsum(col):  # exact, association-independent sum → double
    return F.sum(col.cast(_DEC)).cast("double")


# ----------------------------------------------------------------------
# relational queries (TPC-H-ish; exercise join/agg/broadcast paths)
# ----------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(dt.datetime(2000, 9, 2))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    out = (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(_dsum(F.col("l_quantity")), 4).alias("sum_qty"),
            F.round(_dsum(F.col("l_extendedprice")), 4).alias("sum_base_price"),
            F.round(_dsum(disc_price), 4).alias("sum_disc_price"),
            F.round(_dsum(charge), 4).alias("sum_charge"),
            F.round(_dsum(F.col("l_quantity")) / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(_dsum(F.col("l_extendedprice")) / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(_dsum(F.col("l_discount")) / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(dt.datetime(1998, 3, 15))
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(dt.datetime(1998, 3, 15))
    )
    j = l.join(
        F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        j.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("o_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    j = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.groupBy("r_name", "n_name")
        .agg(
            F.round(
                _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit(dt.datetime(1996, 1, 1)))
            & (F.col("l_shipdate") < F.lit(dt.datetime(1997, 1, 1)))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(_dsum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


# ----------------------------------------------------------------------
# baselib operator queries over the events tick stream (SURVEY.md §2.3)
# ----------------------------------------------------------------------

def op_count(spark, sf_dir):
    return _out(bl.count(_events_stream(spark, sf_dir)), "n_ticks")


def op_accum(spark, sf_dir):
    x = _events_stream(spark, sf_dir)
    dec = TickStream(x.df.withColumn("value", F.col("value").cast("decimal(18,4)")))
    acc = bl.accum(dec, start=0.0)
    out = _out(acc, "running_sum")
    return out.withColumn("running_sum", F.round(F.col("running_sum"), 4))


def op_diff(spark, sf_dir):
    return _out(bl.diff(_events_stream(spark, sf_dir), 1), "dv")


def op_delay(spark, sf_dir):
    return _out(bl.delay(_events_stream(spark, sf_dir), 2), "lagged")


def op_firstn(spark, sf_dir):
    return _out(bl.firstN(_events_stream(spark, sf_dir), 5), "value")


def op_dropdups(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    x = TickStream.from_table(
        df, ts_col="ts", value_col="event_type", key_col="user_id", seq_col="event_id"
    )
    return _out(bl.drop_dups(x), "event_type")


def op_merge(spark, sf_dir):
    a = _events_stream(spark, sf_dir, "click")
    b = _events_stream(spark, sf_dir, "view")
    return _out(bl.merge(a, b), "value")


def op_sample_asof(spark, sf_dir):
    views = _events_stream(spark, sf_dir, "view")
    clicks = _events_stream(spark, sf_dir, "click")
    return _out(bl.sample(clicks, views), "last_view_value")


def op_filter(spark, sf_dir):
    purch = _events_stream(spark, sf_dir, "purchase")
    flag = TickStream(
        purch.df.withColumn("value", F.col("value") > 50), "value"
    )
    clicks = _events_stream(spark, sf_dir, "click")
    return _out(bl.filter_(flag, clicks), "value")


def op_unroll(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    x = TickStream(
        docs.select(
            F.col("doc_id").cast("string").alias(KEY),
            F.lit(dt.datetime(2024, 1, 1)).alias(TS),
            F.lit(0).cast("long").alias(SEQ),
            F.split(F.col("text"), " ").alias("value"),
        )
    )
    u = bl.unroll(x)
    return u.df.select(
        F.col(KEY).cast("long").alias("doc_id"),
        F.col(SEQ).alias("pos"),
        F.col("value").alias("word"),
    )


# ----------------------------------------------------------------------
# csp.stats queries (SURVEY.md §2.5)
# ----------------------------------------------------------------------

def stats_rolling_tick(spark, sf_dir):
    x = _events_stream(spark, sf_dir)
    r = Rolling(x, interval=5, min_window=5)
    out = r.agg(
        roll_sum=F.round(r.sum_col(), 6),
        roll_mean=F.round(r.mean_col(), 6),
        roll_min=r.min_col(),
        roll_max=r.max_col(),
    )
    return out.select(
        F.col(SEQ).alias("event_id"),
        F.col(KEY).cast("long").alias("user_id"),
        "roll_sum", "roll_mean", "roll_min", "roll_max",
    )


def stats_rolling_time(spark, sf_dir):
    x = _events_stream(spark, sf_dir)
    r = Rolling(x, interval=dt.timedelta(hours=6), min_window=dt.timedelta(0))
    out = r.agg(
        roll_sum=F.round(r.sum_col(), 6),
        roll_n=r.count_col().cast("long"),
    )
    return out.select(
        F.col(SEQ).alias("event_id"),
        F.col(KEY).cast("long").alias("user_id"),
        "roll_sum", "roll_n",
    )


def stats_expanding(spark, sf_dir):
    x = _events_stream(spark, sf_dir)
    r = Rolling(x, interval=None, min_window=2)
    # Deterministic var/std for the oracle compare: exact DECIMAL sums of v
    # and v² feed the textbook formula in DOUBLE; both engines then perform
    # identical IEEE ops on identical inputs, so results are bit-identical
    # and need no rounding (round() tie-breaking differs between engines).
    vd = F.col("__vv").cast("decimal(18,4)")
    n = F.count("__vv").over(r._w).cast("double")
    s1 = F.sum(vd).over(r._w).cast("double")
    s2 = F.sum(vd * vd).over(r._w).cast("double")
    var_det = (s2 - s1 * s1 / n) / (n - 1)
    out = r.agg(
        exp_mean=s1 / n,
        exp_var=var_det,
        exp_std=F.sqrt(var_det),
    )
    return out.select(
        F.col(SEQ).alias("event_id"),
        F.col(KEY).cast("long").alias("user_id"),
        "exp_mean", "exp_var", "exp_std",
    )


def stats_quantile(spark, sf_dir):
    x = _events_stream(spark, sf_dir)
    r = Rolling(x, interval=20, min_window=20)
    out = r.agg(
        roll_median=F.round(r.quantile_col(0.5), 6),
        roll_p25=F.round(r.quantile_col(0.25), 6),
    )
    return out.select(
        F.col(SEQ).alias("event_id"),
        F.col(KEY).cast("long").alias("user_id"),
        "roll_median", "roll_p25",
    )


def stats_skew_kurt(spark, sf_dir):
    x = _events_stream(spark, sf_dir)
    r = Rolling(x, interval=None, min_window=4)
    out = r.agg(
        exp_skew=F.round(r.skew_col(bias=False), 6),
        exp_kurt=F.round(r.kurt_col(excess=True, bias=False), 6),
    )
    return out.select(
        F.col(SEQ).alias("event_id"),
        F.col(KEY).cast("long").alias("user_id"),
        "exp_skew", "exp_kurt",
    )


def stats_corr(spark, sf_dir):
    x = _events_stream(spark, sf_dir)
    # second series: centered event time in seconds — exercises the
    # bivariate aligned-pair path (csp.stats.corr)
    t0 = 1704067200.0
    y = TickStream(
        x.df.withColumn(
            "value", (F.unix_micros(F.col(TS)) / 1e6 - F.lit(t0))
        )
    )
    rp = RollingPair(x, y, interval=None, min_window=3)
    out = rp.corr()
    return out.df.select(
        F.col(SEQ).alias("event_id"),
        F.col(KEY).cast("long").alias("user_id"),
        F.round(F.col("value"), 6).alias("exp_corr"),
    )


def stats_ema(spark, sf_dir):
    x = _events_stream(spark, sf_dir)
    e = ema(x, alpha=0.1, adjust=False, ignore_na=True)
    w = Window.partitionBy(KEY).orderBy(F.desc(TS), F.desc(SEQ))
    out = (
        e.df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(KEY).cast("long").alias("user_id"),
            F.round(F.col("value"), 6).alias("ema_last"),
        )
    )
    return out


def stats_ema_halflife(spark, sf_dir):
    # event-time halflife decay — no SQL equivalent (rows-only check)
    x = _events_stream(spark, sf_dir)
    e = ema(x, halflife=dt.timedelta(hours=12), ignore_na=True)
    return e.df.select(
        F.col(SEQ).alias("event_id"),
        F.col(KEY).cast("long").alias("user_id"),
        F.round(F.col("value"), 6).alias("ema_hl"),
    )


# ----------------------------------------------------------------------
# text / dedup / similarity queries (training-pipeline ops)
# ----------------------------------------------------------------------

def text_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        F.round(TX.avg_word_len(t), 6).alias("avg_word_len"),
        F.round(TX.stopword_ratio(t, "en"), 6).alias("stopword_ratio_en"),
    )


def text_langid(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(TX.lang_guess(F.col("text")).alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def dedup_exact(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    groups = DD.exact_duplicates(ev, text_col="props", id_col="event_id")
    return groups.select(
        "text_hash", "canonical_id", "n_dups"
    )


def dedup_ngram(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(docs, shingle_k=8, threshold=0.5)


def dedup_minhash(spark, sf_dir):
    # xxhash64 signatures — engine-specific, rows-only check; verified
    # against dedup_ngram in tests/test_pipeline_ops.py
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(docs, shingle_k=8, threshold=0.5)


def dedup_simhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash_pairs(docs, max_hamming=6)


def ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return cosine_topk(emb, list(q), k=10)


def ann_lsh_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return lsh_topk(emb, list(q), k=10, bits=6, probe_hamming=1)


# ----------------------------------------------------------------------
# driver contract
# ----------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary at sf0.001."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q10_returned_items": q10_returned_items,
        "op_count": op_count,
        "op_accum": op_accum,
        "op_diff": op_diff,
        "op_delay": op_delay,
        "op_firstn": op_firstn,
        "op_dropdups": op_dropdups,
        "op_merge": op_merge,
        "op_sample_asof": op_sample_asof,
        "op_filter": op_filter,
        "op_unroll": op_unroll,
        "stats_rolling_tick": stats_rolling_tick,
        "stats_rolling_time": stats_rolling_time,
        "stats_expanding": stats_expanding,
        "stats_quantile": stats_quantile,
        "stats_skew_kurt": stats_skew_kurt,
        "stats_corr": stats_corr,
        "stats_ema": stats_ema,
        "stats_ema_halflife": stats_ema_halflife,
        "text_stats": text_stats,
        "text_langid": text_langid,
        "dedup_exact": dedup_exact,
        "dedup_ngram": dedup_ngram,
        "dedup_minhash": dedup_minhash,
        "dedup_simhash": dedup_simhash,
        "ann_topk": ann_topk,
        "ann_lsh_topk": ann_lsh_topk,
    }


_W_USER = "PARTITION BY user_id ORDER BY ts, event_id"
_WF_USER = f"OVER ({_W_USER} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 4) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE), 4) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 4) AS sum_disc_price,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,10))) AS DOUBLE), 4) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "q3_shipping_priority": """
SELECT o_orderkey, o_orderdate, o_orderpriority,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 4) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey LIMIT 10
""",
        "q5_local_supplier_volume": """
SELECT r_name, n_name,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 4) AS revenue,
  count(*) AS n_items
FROM lineitem, supplier, orders, customer, nation, region
WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
  AND o_custkey = c_custkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
        "q6_forecast_revenue": """
SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))) AS DOUBLE), 4) AS revenue,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24
""",
        "q10_returned_items": """
SELECT c_custkey, c_name, n_name,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 4) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
        "op_count": f"""
SELECT event_id, user_id, count(*) {_WF_USER} AS n_ticks FROM events
""",
        "op_accum": f"""
SELECT event_id, user_id,
  round(CAST(sum(CAST(value AS DECIMAL(18,4))) {_WF_USER} AS DOUBLE) + 0.0, 4) AS running_sum
FROM events
""",
        "op_diff": f"""
SELECT event_id, user_id, dv FROM (
  SELECT event_id, user_id, value - lag(value) OVER ({_W_USER}) AS dv FROM events
) WHERE dv IS NOT NULL
""",
        "op_delay": f"""
SELECT event_id, user_id, lagged FROM (
  SELECT event_id, user_id, lag(value, 2) OVER ({_W_USER}) AS lagged FROM events
) WHERE lagged IS NOT NULL
""",
        "op_firstn": f"""
SELECT event_id, user_id, value FROM (
  SELECT event_id, user_id, value, row_number() OVER ({_W_USER}) AS rn FROM events
) WHERE rn <= 5
""",
        "op_dropdups": f"""
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         lag(event_type) OVER ({_W_USER}) AS prev FROM events
) WHERE prev IS NULL OR prev <> event_type
""",
        "op_merge": """
SELECT event_id, user_id, value FROM events WHERE event_type IN ('click', 'view')
""",
        "op_sample_asof": f"""
SELECT event_id, user_id, last_view_value FROM (
  SELECT event_id, user_id, event_type,
    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
      OVER ({_W_USER} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_value
  FROM events WHERE event_type IN ('view', 'click')
) WHERE event_type = 'click' AND last_view_value IS NOT NULL
""",
        "op_filter": f"""
SELECT event_id, user_id, value FROM (
  SELECT event_id, user_id, event_type, value,
    last_value(CASE WHEN event_type = 'purchase' THEN (value > 50) END IGNORE NULLS)
      OVER ({_W_USER} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS flag
  FROM events WHERE event_type IN ('purchase', 'click')
) WHERE event_type = 'click' AND flag
""",
        "op_unroll": """
SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, l[u.i] AS word
FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents WHERE doc_id < 50),
     LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) u
""",
        "stats_rolling_tick": f"""
SELECT event_id, user_id,
  round(roll_sum, 6) AS roll_sum, round(roll_mean, 6) AS roll_mean,
  roll_min, roll_max
FROM (
  SELECT event_id, user_id,
    sum(value)  OVER ({_W_USER} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_sum,
    avg(value)  OVER ({_W_USER} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_mean,
    min(value)  OVER ({_W_USER} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_min,
    max(value)  OVER ({_W_USER} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_max,
    row_number() OVER ({_W_USER}) AS rn
  FROM events
) WHERE rn >= 5
""",
        "stats_rolling_time": """
SELECT event_id, user_id, round(roll_sum, 6) AS roll_sum, roll_n FROM (
  SELECT event_id, user_id,
    sum(value) OVER w AS roll_sum,
    count(value) OVER w AS roll_n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 21599999999 PRECEDING AND CURRENT ROW)
)
""",
        "stats_expanding": f"""
SELECT event_id, user_id,
  s1 / n AS exp_mean,
  (s2 - s1 * s1 / n) / (n - 1) AS exp_var,
  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS exp_std
FROM (
  SELECT event_id, user_id,
    CAST(count(value) {_WF_USER} AS DOUBLE) AS n,
    CAST(sum(CAST(value AS DECIMAL(18,4))) {_WF_USER} AS DOUBLE) AS s1,
    CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) {_WF_USER} AS DOUBLE) AS s2,
    row_number() OVER ({_W_USER}) AS rn
  FROM events
) WHERE rn >= 2
""",
        "stats_quantile": f"""
SELECT event_id, user_id,
  round(roll_median, 6) AS roll_median, round(roll_p25, 6) AS roll_p25
FROM (
  SELECT event_id, user_id,
    quantile_cont(value, 0.5)  OVER ({_W_USER} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS roll_median,
    quantile_cont(value, 0.25) OVER ({_W_USER} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS roll_p25,
    row_number() OVER ({_W_USER}) AS rn
  FROM events
) WHERE rn >= 20
""",
        "stats_skew_kurt": f"""
SELECT event_id, user_id,
  round(exp_skew, 6) AS exp_skew, round(exp_kurt, 6) AS exp_kurt
FROM (
  SELECT event_id, user_id,
    skewness(value) {_WF_USER} AS exp_skew,
    kurtosis(value) {_WF_USER} AS exp_kurt,
    row_number() OVER ({_W_USER}) AS rn
  FROM events
) WHERE rn >= 4
""",
        "stats_corr": f"""
SELECT event_id, user_id, round(c, 6) AS exp_corr FROM (
  SELECT event_id, user_id,
    corr(value, epoch_us(ts) / 1e6 - 1704067200.0) {_WF_USER} AS c,
    row_number() OVER ({_W_USER}) AS rn
  FROM events
) WHERE rn >= 3
""",
        "stats_ema": """
SELECT user_id,
  round(list_reduce(list(value ORDER BY ts, event_id), (a, b) -> a * 0.9 + b * 0.1), 6) AS ema_last
FROM events GROUP BY user_id
""",
        "text_stats": r"""
SELECT doc_id,
  len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
  round(list_sum(list_transform(string_split_regex(trim(lower(text)), '\s+'), w -> length(w)))
        / len(string_split_regex(trim(lower(text)), '\s+')), 6) AS avg_word_len,
  round(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        w -> list_contains(['the','a','and','of','to','in','is','it','that','for'], w)))
        / len(string_split_regex(trim(lower(text)), '\s+')), 6) AS stopword_ratio_en
FROM documents
""",
        "text_langid": r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
), hits AS (
  SELECT doc_id,
    len(list_filter(t, w -> list_contains(['the','a','and','of','to','in','is','it','that','for'], w))) AS h_en,
    len(list_filter(t, w -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','auf'], w))) AS h_de,
    len(list_filter(t, w -> list_contains(['le','la','les','et','est','un','une','des','que','pour'], w))) AS h_fr,
    len(list_filter(t, w -> list_contains(['el','la','los','y','es','un','una','de','que','por'], w))) AS h_es
  FROM toks
)
SELECT CASE
    WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
    WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
    WHEN h_fr >= h_es THEN 'fr'
    ELSE 'es' END AS lang_guess,
  count(*) AS n_docs
FROM hits GROUP BY 1
""",
        "dedup_exact": r"""
SELECT md5(array_to_string(string_split_regex(trim(lower(props)), '\s+'), ' ')) AS text_hash,
  min(event_id) AS canonical_id, count(*) AS n_dups
FROM events
GROUP BY 1 HAVING count(*) > 1
""",
        "dedup_ngram": r"""
WITH norm AS (
  SELECT doc_id, array_to_string(string_split_regex(trim(lower(text)), '\s+'), ' ') AS n FROM documents
), sh AS (
  SELECT DISTINCT doc_id, substring(n, unnest(generate_series(1, greatest(length(n)-7, 1))), 8) AS s
  FROM norm
), sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(count(*) AS DOUBLE) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b,
  round(i / (sa.c + sb.c - i), 6) AS jaccard
FROM inter JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
WHERE i / (sa.c + sb.c - i) >= 0.5
""",
        "ann_topk": """
SELECT e.vec_id,
  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
        / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
           * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))), 6) AS cos_sim
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY cos_sim DESC, e.vec_id LIMIT 10
""",
    }
