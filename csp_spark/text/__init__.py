from .analysis import (
    GOPHER_STOP_WORDS, gopher_rules, c4_filters,
    annotate, tokens, token_count, char_count, avg_word_len, punct_ratio,
    digit_ratio, upper_ratio, stopword_ratio, quality_score, lang_guess,
    fingerprint, winnow_fingerprints, STOPWORDS,
    dup_word_fraction, dup_line_fraction, repetition_stats,
    chunk_documents, compression_ratio, build_vocab, encode_tokens,
    spread, redact_pii, pii_counts,
    PII_PATTERNS,
    boilerplate_lines, remove_boilerplate, decontaminate,
    repeated_spans, remove_repeated_spans, lm_scores,
    term_stats, doc_tfidf, quality_classifier_scores,
)
from .bpe import train_bpe, apply_bpe, bpe_vocab, EOW
