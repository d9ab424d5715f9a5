"""SemDeDup: semantic deduplication over an embedding column.

Public method (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540):
k-means cluster the embeddings, compare pairs only WITHIN a cluster,
and for every pair whose cosine similarity clears ``eps`` drop one
side. The paper's keep policy retains the item with the LOWEST
cosine similarity to its cluster centroid (the "edge" example);
removal is judged against every other cluster member, not just
surviving ones — both properties are preserved here.

Scale shape (100 TB contract): clustering bounds candidate
generation to sum(|cell|^2) instead of N^2 — n_clusters is the knob
(the paper uses 50k clusters for LAION). The in-cell self-join rides
:func:`csp_spark.dedup.dedup._capped_bucket_pairs`, so a degenerate
cell (e.g. an all-zeros embedding family) is star-grouped through
its exact-signature hash instead of exploding quadratically, with
the recall loss logged. Vectors travel only within their cell's
shuffle partition; the centroid table is n_clusters x dim — always
broadcast. KMeans trains on the deterministic md5 identity sample
(see ivf_index), never a full-corpus scan.

``n_clusters=1`` degenerates to exact all-pairs semantic dedup —
the hash-checkable oracle case (every pair is compared, so the
result is centroid-free for ``keep="min_id"`` and must equal the
plain SQL EXISTS formulation regardless of where KMeans sits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..similarity.ann import cosine, ivf_index
from .dedup import _capped_bucket_pairs


def semdedup(
    embeddings: DataFrame,
    eps: float = 0.95,
    n_clusters: int = 16,
    keep: str = "edge",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    cap: int = 20_000,
) -> DataFrame:
    """Mark semantic duplicates: returns one row per input id with
    ``kept`` (1 = survivor, 0 = removed) and the ``cell`` it was
    compared within.

    keep="edge"   — paper policy: within a duplicate pair the member
                    with the LOWER (centroid_sim, id) survives, so
                    cluster-edge examples are retained.
    keep="min_id" — order-free policy: the lower id survives.
                    Deterministic without any centroid, which makes
                    the n_clusters=1 case pure-SQL checkable.

    A row is removed iff ANY same-cell row with a better (lower)
    keep-order is eps-similar to it — matching the paper's
    triangular max-similarity test, where removal does not depend on
    whether the better row itself survives.
    """
    if keep not in ("edge", "min_id"):
        raise ValueError(f"semdedup keep must be 'edge' or 'min_id', got {keep!r}")
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    spark = base.sparkSession
    if n_clusters <= 1:
        cells = base.withColumn("cell", F.lit(0))
        if keep == "edge":
            # single-cell centroid = the exact mean vector, computed
            # distributively (posexplode -> per-dimension avg); the
            # collected centroid is dim doubles — a literal, not data
            mean = (
                base.select(F.posexplode("v").alias("i", "x"))
                .groupBy("i").agg(F.avg("x").alias("m"))
                .orderBy("i").collect()
            )
            cvec = F.array(*[F.lit(float(r["m"])) for r in mean])
            cells = cells.withColumn("__csim", cosine(F.col("v"), cvec))
    else:
        indexed, centers = ivf_index(
            base, n_cells=n_clusters, id_col="id", vec_col="v", seed=seed
        )
        cdf = spark.createDataFrame(
            [(int(i), [float(x) for x in c]) for i, c in enumerate(centers)],
            "cell int, __cvec array<double>",
        )
        cells = indexed.join(F.broadcast(cdf), "cell").withColumn(
            "__csim", cosine(F.col("v"), F.col("__cvec"))
        ).drop("__cvec")
    ord_col = (
        F.struct(F.col("__csim"), F.col("id")) if keep == "edge"
        else F.struct(F.col("id"))
    )
    rows = cells.select(
        "id", "cell", "v",
        ord_col.alias("__ord"),
        # exact-signature hash for the degenerate-cell star grouping:
        # identical vectors share it, and payload (v, __ord with
        # csim derived from v) is signature-determined within a group
        # as _capped_bucket_pairs requires — except __ord's id field,
        # which only breaks exact ties, where either orientation is a
        # valid dup-pair removal
        F.xxhash64(F.col("v").cast("string")).alias("__sigh"),
    )
    pairs = _capped_bucket_pairs(
        rows, ["cell"], cap, "semdedup", payload=("v", "__ord")
    )
    removed = (
        pairs.filter(cosine(F.col("v_a"), F.col("v_b")) >= F.lit(eps))
        .select(
            F.when(F.col("__ord_a") > F.col("__ord_b"), F.col("id_a"))
            .otherwise(F.col("id_b")).alias("id")
        )
        .distinct()
    )
    return (
        cells.join(removed.withColumn("__rm", F.lit(1)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("__rm").isNull(), 1).otherwise(0).cast("int").alias("kept"),
            "cell",
        )
    )
