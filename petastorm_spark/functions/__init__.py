"""Column-function namespace: the engine's reusable expression
builders, all JVM-side built-ins (no Python UDFs).

    from petastorm_spark import functions as PF
    df.withColumn("frac", PF.md5_fraction("user_id"))
"""

from petastorm_spark.predicates import md5_fraction  # noqa: F401
from petastorm_spark.operators.dedup import (  # noqa: F401
    cw_hash_pair,
    hash60,
    shingles_from_tokens,
)
from petastorm_spark.operators.sampling import shard_id  # noqa: F401
from petastorm_spark.operators.similarity import cosine, dot, norm  # noqa: F401
from petastorm_spark.operators.text import (  # noqa: F401
    alpha_ratio,
    avg_token_len,
    detect_language,
    distinct_token_count,
    fingerprint,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    uniqueness_ratio,
)
from petastorm_spark.session import ns_to_timestamp  # noqa: F401
