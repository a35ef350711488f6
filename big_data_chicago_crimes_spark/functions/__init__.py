"""Reusable column-expression builders (all JVM-side, codegen-friendly)."""

from big_data_chicago_crimes_spark.functions.temporal import (
    date_parts,
    quarter_name,
    season,
)
from big_data_chicago_crimes_spark.functions.text import (
    char_ngrams,
    doc_fingerprint,
    lang_id_scores,
    punct_ratio,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from big_data_chicago_crimes_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "date_parts",
    "quarter_name",
    "season",
    "char_ngrams",
    "doc_fingerprint",
    "lang_id_scores",
    "punct_ratio",
    "stopword_ratio",
    "token_count",
    "tokens",
    "word_shingles",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
