"""Similarity search over the embeddings table, every tier of the
ANN family side by side: exact brute-force cosine (the baseline),
LSH hyperplane buckets (no training), IVF coarse cells (partition
pruning), product quantization (16x-compressed ADC scoring), and the
batch kNN join — with recall@10 of each approximate tier against the
exact answer.

Run: python examples/08_ann_retrieval.py
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import csp_spark as csp
from csp_spark.similarity import (
    cosine_topk,
    ivf_topk,
    knn_join,
    lsh_topk,
    pq_index,
    pq_topk,
)
from csp_spark.sources import read_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = csp.get_spark(app_name="ex_ann")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, f"{SF}/embeddings.parquet")
    q = list(emb.filter(F.col("vec_id") == 3).select("embedding").first()[0])

    t0 = time.time()
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    t_exact = time.time() - t0
    truth = set(exact)
    print(f"exact top-10: {exact} ({t_exact:.2f}s)")

    def recall(ids):
        return len(truth & set(ids)) / len(truth)

    # hyperplane LSH trades recall steeply on isotropic synthetic
    # vectors (no cluster structure for the planes to find) — shown
    # with a wide probe so the trade is visible; IVF/PQ below are the
    # tiers that hold recall on data like this
    t0 = time.time()
    lsh = [r["vec_id"] for r in
           lsh_topk(emb, q, k=10, bits=4, probe_hamming=1).collect()]
    print(f"lsh   recall@10 {recall(lsh):.1f} ({time.time()-t0:.2f}s)"
          " (probes ~5/16 of buckets)")

    t0 = time.time()
    ivf = [r["vec_id"] for r in
           ivf_topk(emb, q, k=10, n_cells=8, n_probe=3).collect()]
    print(f"ivf   recall@10 {recall(ivf):.1f} ({time.time()-t0:.2f}s)")

    t0 = time.time()
    enc, books = pq_index(emb, m=8, n_codes=32)
    pq = [r["vec_id"] for r in pq_topk(enc, books, q, k=30).collect()]
    print(f"pq    recall@10-in-30 {recall(pq):.1f} ({time.time()-t0:.2f}s)"
          " (PQ-then-rerank pool)")

    # batch retrieval: every 50th vector is a query, top-3 neighbors each
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("cid"), "embedding")
    t0 = time.time()
    nn = knn_join(queries, corpus, k=3, method="blas")
    n = nn.count()
    print(f"knn_join: {n} (query, neighbor) rows ({time.time()-t0:.2f}s)")

    # SemDeDup (arXiv:2303.09540): plant one duplicate vector, cluster,
    # and prune — exactly one member of the planted pair survives
    from csp_spark.dedup import semdedup

    dup = emb.filter("vec_id = 5").withColumn(
        "vec_id", F.lit(990_000).cast("long")
    )
    t0 = time.time()
    sd = semdedup(emb.unionByName(dup), eps=0.99, n_clusters=8, keep="edge")
    pair = {r["vec_id"]: r["kept"] for r in
            sd.filter(F.col("vec_id").isin(5, 990_000)).collect()}
    n_kept = sd.filter("kept = 1").count()
    print(f"semdedup: {n_kept} of {sd.count()} kept, planted pair -> "
          f"{pair} ({time.time()-t0:.2f}s)")
    assert sum(pair.values()) == 1  # one survivor per duplicate pair

    assert recall(ivf) >= 0.7 and recall(pq) >= 0.6 and n > 0
    print("OK")


if __name__ == "__main__":
    main()
