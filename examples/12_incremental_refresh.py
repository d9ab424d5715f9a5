"""Continual-pretraining data refresh — the day-N loop of a corpus
that keeps growing: the base corpus is cleaned, mixed with multi-epoch
oversampling, and IVF-indexed ONCE; each increment then only pays
filter + assignment + append, never a re-train or a corpus shuffle.

Day 0 (full build):
  1. clean       — Gopher rule bundle + C4 recipe, one zero-shuffle scan
  2. mix         — repeat_to_budget: high-weight sources repeat whole
                   epochs toward the token budget (Pile/Llama recipe)
  3. index       — ivf_index (KMeans on an md5 identity sample) and
                   save_index PARTITIONED by cell
Day 1 (increment only):
  4. assign      — ivf_assign against the FROZEN centroids (one Arrow
                   matmul per batch), append into the partitioned layout
  5. dedup gate  — the increment's vectors probe their own cells for
                   near-dups already in the index before admission
  6. query       — ivf_topk_indexed over the grown index still prunes
                   at the directory level

Run: python examples/12_incremental_refresh.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from csp_spark import get_spark
from csp_spark.pipeline import repeat_to_budget
from csp_spark.similarity import (
    cosine,
    ivf_assign,
    ivf_index,
    ivf_topk_indexed,
    load_index,
    save_index,
)
from csp_spark.sources import read_table
from csp_spark.text import c4_filters, gopher_rules

SF = "/root/testdata/sf0.001"


def main() -> None:
    import tempfile

    spark = get_spark(app_name="incremental_refresh",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # ---------------- day 0: the full build ----------------
    docs = read_table(spark, f"{SF}/documents.parquet")
    # both bundles return (doc_id, per-rule flags, keep) — join the
    # flags back and report pass rates; the full Gopher/C4 gates are
    # calibrated for web text (>=50 words, multi-line docs), so on
    # this tiny synthetic corpus we gate on the rules that bite
    # (alpha-word ratio + symbol ratio) and keep the rest as report
    g = gopher_rules(docs).select(
        "doc_id", "keep", "r1_word_count", "r6_alpha_words",
        "r3_symbol_ratio",
    )
    c = c4_filters(docs).select("doc_id", F.col("keep").alias("c4_keep"))
    flagged = docs.join(g, "doc_id").join(c, "doc_id")
    rates = flagged.agg(
        *[F.avg(F.col(r).cast("double")).alias(r)
          for r in ("keep", "r1_word_count", "r6_alpha_words",
                    "r3_symbol_ratio", "c4_keep")]
    ).first()
    print("day 0 rule pass rates:",
          {k: round(rates[k], 3) for k in rates.asDict()})
    clean = (flagged.filter("r6_alpha_words = 1 AND r3_symbol_ratio = 1")
             .select(*docs.columns))
    n_clean = clean.count()
    print(f"day 0: {docs.count()} docs -> {n_clean} after the gates")

    mixed = repeat_to_budget(
        clean, {"src0": 5.0, "src1": 1.0}, 20_000, token_col="n_chars"
    )
    per_epoch = (mixed.groupBy("source", "epoch").count()
                 .orderBy("source", "epoch").collect())
    for r in per_epoch:
        print(f"  mixture {r['source']} epoch {r['epoch']}: {r['count']} docs")

    emb = read_table(spark, f"{SF}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 4 != 0)        # day-0 corpus
    inc = emb.filter(F.col("vec_id") % 4 == 0)         # tomorrow's batch
    # plant an exact re-crawl of an indexed vector in the increment so
    # the admission gate has something to catch
    planted = base.limit(1).select(
        (F.lit(10_000_000) + F.col("vec_id")).alias("vec_id"),
        *[c for c in emb.columns if c != "vec_id"],
    )
    inc = inc.unionByName(planted)
    indexed, centers = ivf_index(base, n_cells=8)
    path = tempfile.mkdtemp(prefix="ivf_refresh_")
    save_index(indexed, path, partition_col="cell", centers=centers)
    print(f"day 0: indexed {base.count()} vectors into 8 cells at {path}")

    # ---------------- day 1: the increment ----------------
    # frozen centroids: assignment is one matmul per Arrow batch
    assigned = ivf_assign(inc, centers)

    # admission gate: probe each increment vector's OWN cell for
    # near-duplicates already indexed (cell-bounded pairs — the
    # SemDeDup discipline: never all-pairs across cells)
    df0, centers0 = load_index(spark, path)
    cand = (
        assigned.select(F.col("vec_id").alias("new_id"),
                        F.col("embedding").alias("new_emb"), "cell")
        .join(df0.select(F.col("vec_id").alias("old_id"),
                         F.col("embedding").alias("old_emb"), "cell"),
              "cell")
        .withColumn("cos", cosine(F.col("new_emb"), F.col("old_emb")))
        .filter(F.col("cos") > 0.95)
    )
    n_dup = cand.select("new_id").distinct().count()
    admitted = assigned.join(
        cand.select(F.col("new_id").alias("vec_id")).distinct(),
        "vec_id", "left_anti",
    )
    print(f"day 1: {inc.count()} increment vectors, "
          f"{n_dup} near-dup rejected, {admitted.count()} admitted")

    admitted.write.mode("append").partitionBy("cell").parquet(path)

    # the grown index still answers with directory-level pruning
    # (query with vec 1 — a DAY-0 vector, so the assertion checks
    # day-0 persistence across the append rather than the admission
    # gate's treatment of the increment)
    df1, centers1 = load_index(spark, path)
    q = list(emb.filter(F.col("vec_id") == 1)
             .select("embedding").first()[0])
    top = ivf_topk_indexed(df1, centers1, q, k=5, n_probe=2)
    rows = top.collect()
    print(f"index now {df1.count()} vectors; top-5 for vec 1:")
    for r in rows:
        print(f"  vec {r['vec_id']}: cos {r['cos_sim']}")
    assert rows[0]["vec_id"] == 1 and rows[0]["cos_sim"] == 1.0


if __name__ == "__main__":
    main()
