from .columns import (
    cosine_sim,
    dot_product,
    hash_bucket,
    jaccard_arrays,
    md5_sample,
    money,
    null_or_blank,
    parse_date_expr,
    stable_id,
    word_ngrams,
)

__all__ = [
    "cosine_sim",
    "dot_product",
    "hash_bucket",
    "jaccard_arrays",
    "md5_sample",
    "money",
    "null_or_blank",
    "parse_date_expr",
    "stable_id",
    "word_ngrams",
]
