"""End-to-end training-corpus curation over the synthetic documents
table: boilerplate-line removal → exact dedup → repeated-substring
removal → benchmark decontamination → model-based + LM-perplexity
quality scoring → deterministic split → temperature sampling → BPE
tokenize → sequence packing. Each stage is a declarative DataFrame
transform — one Spark job chain, Catalyst-optimized end to end.

Run: python examples/04_curation_pipeline.py
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import csp_spark as csp
from csp_spark.dedup import dedup_exact
from csp_spark.pipeline.sampling import hash_split
from csp_spark.sources import read_table
from csp_spark.text import (
    decontaminate,
    quality_classifier_scores,
    remove_boilerplate,
)

SF = "/root/testdata/sf0.001"


def composed_curation(spark, sf_dir: str = SF, shards_path: str | None = None):
    """C4 line cleaning → SemDeDup → next-fit sequence packing →
    (optionally) order-preserving training shards, composed as ONE
    lazy DataFrame chain — the composed-plan pin:
    tests/test_pipeline_ops.py asserts the chain's exchange count via
    tools/plan_audit.py, proving the zero-shuffle bundles stay FUSED
    when composed. The C4 recipe adds no exchange (pure codegen scan),
    SemDeDup contributes only its own cluster-bounded machinery, the
    survivor semi-join shuffles once on doc_id, and packing's only
    shuffle is its groupBy(shard) — composition adds nothing.

    Returns the packed-sequence table (doc_id, shard, n_tokens, seq,
    offset); with ``shards_path`` also writes size-balanced
    order-preserving shards (the dataloader handoff)."""
    from csp_spark.dedup import semdedup
    from csp_spark.pipeline import pack_next_fit
    from csp_spark.pipeline.storage import write_training_shards
    from csp_spark.text import c4_filters, token_count

    docs = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = read_table(spark, f"{sf_dir}/embeddings.parquet")
    # the synthetic corpus is single-line prose; shape it into C4's
    # multi-line world: three sentence-terminated content lines plus
    # one line each of the recipe's removal classes (too short /
    # "javascript") so every rule fires
    lined = docs.withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.concat(F.col("text"), F.lit(".")),
            F.lit("too short."),
            F.lit("this line mentions javascript and is removed."),
            F.concat(F.lit("again: "), F.col("text"), F.lit(".")),
            F.concat(F.lit("finally: "), F.col("text"), F.lit(".")),
        ),
    )
    c4 = c4_filters(lined)
    cleaned = c4.filter(F.col("keep") == 1).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    keep_ids = (
        semdedup(emb, eps=0.995, n_clusters=8, keep="min_id")
        .filter(F.col("kept") == 1)
        .select(F.col("vec_id").alias("doc_id"))
    )
    survivors = cleaned.join(keep_ids, "doc_id", "left_semi")
    toks = survivors.select(
        "doc_id", token_count(F.col("text")).alias("tok")
    )
    packed = pack_next_fit(toks, "doc_id", "tok", budget=256, num_shards=8)
    if shards_path is not None:
        write_training_shards(
            packed, shards_path, order_col="seq", rows_per_shard=200
        )
    return packed


def main() -> None:
    spark = csp.get_spark(app_name="ex_curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, f"{SF}/documents.parquet").select("doc_id", "text")
    n0 = docs.count()

    # 1. corpus-level boilerplate: the testdata is single-line, so give
    #    every doc a synthetic repeated footer to demonstrate the sweep
    lined = docs.withColumn(
        "text", F.concat_ws("\n", F.col("text"), F.lit("(c) example corp"))
    )
    clean = remove_boilerplate(lined, min_docs=2)
    assert clean.filter(F.col("n_removed") >= 1).count() == n0  # footer gone

    # 1b. Gopher rule bundle (Rae et al. 2021): seven keep rules as one
    #     zero-shuffle scan. The synthetic corpus has <2 of the required
    #     English stop words per doc, so r7 fails corpus-wide by design —
    #     report the per-rule census and gate on the structural rules.
    from csp_spark.text import gopher_rules

    g = gopher_rules(clean.select("doc_id", "text"))
    census = g.agg(*[F.sum(c).alias(c) for c in g.columns if c != "doc_id"])
    print("gopher rule pass counts:", census.first().asDict())
    structural = g.filter(
        (F.col("r3_symbol_ratio") == 1) & (F.col("r4_bullet_lines") == 1)
        & (F.col("r5_ellipsis_lines") == 1) & (F.col("r6_alpha_words") == 1)
    ).select("doc_id")
    clean = clean.join(structural, "doc_id", "left_semi")

    # 2. exact dedup on normalized text.
    #    Each demo stage below re-references its upstream result on BOTH
    #    sides of a join (dedup groups⋈source, span census⋈tokens,
    #    decontaminate⋈survivors, scores⋈docs): composed lazily, the
    #    plan TREE doubles per stage — exponentially large plans whose
    #    analysis/plan-string cost dwarfs the data work (optimization
    #    guide §3.3/§7.3). localCheckpoint() at each fan-out point
    #    truncates the lineage so every stage's plan stays stage-sized.
    clean = clean.localCheckpoint()
    deduped = dedup_exact(clean.select("doc_id", "text"))
    n2 = deduped.count()
    deduped = deduped.localCheckpoint()

    # 2b. sub-document dedup: strip token spans duplicated elsewhere
    #     in the corpus (Lee et al. ACL'22 family), keeping one
    #     canonical copy of every repeated passage
    from csp_spark.text import remove_repeated_spans

    despanned = remove_repeated_spans(deduped, k=10)
    n_span_tokens = despanned.agg(F.sum("n_removed_tokens")).first()[0]
    deduped = despanned.select("doc_id", "text").localCheckpoint()

    # 3. decontamination vs a (tiny) benchmark set
    evals = docs.filter(F.col("doc_id") % 97 == 0)
    decon = decontaminate(deduped, evals, n=8, min_matches=1)
    keep_ids = decon.filter(~F.col("contaminated")).select("doc_id")
    survivors = deduped.join(keep_ids, "doc_id", "left_semi").localCheckpoint()

    # 4. quality scoring + filter: the deterministic hashed linear
    #    model AND the statistical LM signal (drop the worst-perplexity
    #    tail — the CCNet discipline)
    from csp_spark.text import lm_scores

    lm = lm_scores(survivors)
    nll_cap = lm.agg(
        F.percentile_approx("avg_nll", 0.95, 10_000)
    ).first()[0]
    scored = (
        survivors.join(quality_classifier_scores(survivors), "doc_id")
        .join(lm.select("doc_id", "avg_nll"), "doc_id")
        .filter(
            (F.col("quality_score") > 0.35)
            & (F.col("avg_nll").isNull() | (F.col("avg_nll") <= nll_cap))
        )
    )

    # 4b. DSIR (Xie et al. 2023): weight every surviving doc by its
    #     n-gram likelihood ratio against a target slice (here: three
    #     sources standing in for a curated corpus) and keep the top
    #     half — hashed features keep the model broadcastable at scale
    from csp_spark.pipeline import dsir_select

    # materialize the curated snapshot first: dsir builds gram models
    # over the corpus, and re-deriving the full upstream lineage
    # (boilerplate -> dedup -> spans -> decontaminate -> scores) for
    # every model pass would multiply the whole pipeline
    scored = scored.persist()
    n_scored = scored.count()
    tgt = docs.join(
        read_table(spark, f"{SF}/documents.parquet")
        .filter(F.col("source").isin("src0", "src1", "src2"))
        .select("doc_id"),
        "doc_id", "left_semi",
    )
    k = max(1, n_scored // 2)
    picked = dsir_select(
        scored.select("doc_id", "text"), tgt, k=k, n_buckets=1 << 18
    )
    scored = scored.join(
        picked.filter(F.col("selected") == 1).select("doc_id"),
        "doc_id", "left_semi",
    )
    print(f"dsir: kept top {k} of {n_scored} by target likelihood ratio")

    # 5. reproducible train/val/test assignment (pure column expr —
    #    the same doc lands in the same split on any cluster/engine)
    final = hash_split(scored, "doc_id")
    dist = {r["split"]: r["n"] for r in
            final.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_final = sum(dist.values())
    print(f"docs: {n0} -> dedup {n2} -> decontaminated+scored {n_final}")
    print("splits:", dist)
    assert set(dist) <= {"train", "val", "test"} and dist["train"] > 0
    assert n_final <= n2 <= n0

    # 6. temperature-weighted sampling on the quality score, then pack
    #    the kept train docs into 256-token training sequences
    from csp_spark.pipeline import pack_next_fit, pack_stats, weighted_sample
    from csp_spark.text import token_count

    train = final.filter(F.col("split") == "train")
    kept = weighted_sample(train, "doc_id", "quality_score", temperature=2.0)

    # 7. tokenize with a corpus-trained BPE (sample-based training,
    #    distributed apply), then pack the PIECE counts into 256-token
    #    training sequences
    from csp_spark.text import apply_bpe, train_bpe

    merges = train_bpe(kept, n_merges=64, sample_cap=200, id_col="doc_id")
    toks = apply_bpe(kept, merges).select(
        "doc_id", F.size("bpe_tokens").alias("tok")
    )
    packed = pack_next_fit(toks, "doc_id", "tok", budget=256, num_shards=8)
    st = pack_stats(packed, 256)
    n_seq = st.count()
    fill = st.agg(F.avg("fill")).first()[0]
    print(f"train {train.count()} -> sampled {kept.count()} "
          f"-> {len(merges)} BPE merges -> {n_seq} sequences "
          f"(mean fill {fill:.2f}, {n_span_tokens} duplicated tokens "
          f"stripped upstream)")
    assert n_seq > 0 and 0.0 < fill <= 1.0
    # end-to-end determinism: the whole pipeline replays identically
    again = {r["split"]: r["n"] for r in
             hash_split(scored, "doc_id").groupBy("split")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == dist
    print("OK")


if __name__ == "__main__":
    main()
