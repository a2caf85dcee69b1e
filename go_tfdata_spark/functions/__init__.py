from go_tfdata_spark.functions.text import (  # noqa: F401
    fingerprint,
    lang_id,
    normalize_text,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)
from go_tfdata_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
