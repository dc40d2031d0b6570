from sri_spark.text.analysis import (
    STOPWORDS,
    doc_fingerprint,
    language_id,
    quality_features,
    tokens_col,
)

__all__ = [
    "STOPWORDS",
    "tokens_col",
    "quality_features",
    "language_id",
    "doc_fingerprint",
]
