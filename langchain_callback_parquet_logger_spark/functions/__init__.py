"""Reusable column functions (all JVM-side, codegen-friendly — no Python
UDFs): portable hashing, shingling, similarity, and text metrics. These are
the building blocks the operators compose; exposed here as a public
functions namespace."""

from ..ingest import extract_custom_id_from_tags, payload_field
from ..operators.dedup import hash60, jaccard, shingles
from ..operators.graph import connected_components
from ..operators.pipeline import (
    clean_corpus,
    hash_sample,
    mixture_sample,
    quality_score,
)
from ..operators.similarity import cosine, dot, norm
from ..operators.temporal import asof_join
from ..operators.text import (
    fingerprint,
    predicted_lang,
    rolling_hash,
    stopword_count,
    token_count_bpe,
    token_count_ws,
)

__all__ = [
    "hash_sample",
    "mixture_sample",
    "hash60",
    "shingles",
    "jaccard",
    "cosine",
    "dot",
    "norm",
    "fingerprint",
    "rolling_hash",
    "token_count_ws",
    "token_count_bpe",
    "stopword_count",
    "predicted_lang",
    "payload_field",
    "extract_custom_id_from_tags",
    "quality_score",
    "clean_corpus",
    "connected_components",
    "asof_join",
]
