from .ann import (
    dot, norm, cosine, cosine_pairs_above, cosine_topk, infer_dim, lsh_index, lsh_topk,
    embedding_near_dups, hard_negatives, ivf_assign, ivf_index, ivf_topk, ivf_topk_indexed,
    knn_join, load_index, save_index, pq_index, pq_topk, save_pq_index, load_pq_index,
    hash_codebooks, pq_encode_expr,
)
