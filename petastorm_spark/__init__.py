"""petastorm_spark — a PySpark-native rebuild of uber/petastorm's
capabilities: Parquet <-> ML-training data access expressed as Spark
DataFrame plans, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Public surface mirrors the reference's exports (petastorm/__init__.py)
re-expressed Spark-first.
"""

from petastorm_spark.session import get_spark, load_tables  # noqa: F401
from petastorm_spark.predicates import (  # noqa: F401
    in_set,
    in_intersection,
    in_lambda,
    in_negate,
    in_reduce,
    in_pseudorandom_split,
    filter_dataframe,
    md5_fraction,
)

__version__ = "0.1.0"
