from .ann import (
    dot, norm, cosine, cosine_topk, infer_dim, lsh_index, lsh_topk,
    embedding_near_dups, ivf_index, ivf_topk, knn_join,
)
