from .dedup import (
    normalize, exact_duplicates, dedup_exact, char_shingles, word_shingles,
    minhash_signature, minhash_lsh_pairs, ngram_jaccard_pairs, simhash,
    hamming64, simhash_pairs, hamming_pairs,
)
from .components import (
    connected_components,
    incremental_dedup,
    resolve_duplicates,
)
from .semdedup import semdedup
