"""petastorm_spark — a PySpark-native rebuild of uber/petastorm's
capabilities: Parquet <-> ML-training data access expressed as Spark
DataFrame plans, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Public surface mirrors the reference's exports (petastorm/__init__.py)
re-expressed Spark-first.
"""

from petastorm_spark.session import get_spark, load_tables, ns_to_timestamp  # noqa: F401
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
from petastorm_spark.unischema import (  # noqa: F401
    Unischema,
    UnischemaField,
    dict_to_spark_row,
)
from petastorm_spark.codecs import (  # noqa: F401
    CompressedImageCodec,
    CompressedNdarrayCodec,
    NdarrayCodec,
    ScalarCodec,
)
from petastorm_spark.etl.dataset_metadata import materialize_dataset  # noqa: F401
from petastorm_spark.reader import Reader, make_batch_reader, make_reader  # noqa: F401
from petastorm_spark.transform import TransformSpec  # noqa: F401
from petastorm_spark.converter import make_spark_converter  # noqa: F401
from petastorm_spark.operators.ngram import NGram  # noqa: F401
from petastorm_spark.operators.sampling import WeightedSamplingReader  # noqa: F401
from petastorm_spark.operators.dedup import (  # noqa: F401
    canonicalize,
    connected_components,
    contamination_overlap,
    decontaminate,
    exact_dedup,
    near_dup_pairs,
)
from petastorm_spark.operators.packing import (  # noqa: F401
    pack_assignments,
    pack_sequences,
)
from petastorm_spark.operators.sampling_extra import (  # noqa: F401
    bm25_scores,
    bm25_top_k,
    sample_stratified,
    token_budget_mix,
)
from petastorm_spark.operators.bpe import bpe_learn, bpe_token_count  # noqa: F401
from petastorm_spark.operators.graph import (  # noqa: F401
    degree_assortativity,
    kcore_decompose,
    label_propagation,
    pagerank,
    triangle_census,
)
from petastorm_spark.operators.ml import tree_ensemble_score  # noqa: F401
from petastorm_spark.operators.similarity import (  # noqa: F401
    embedding_centroids,
    project_embeddings,
    semantic_dedup,
)
from petastorm_spark.operators.text import (  # noqa: F401
    inverted_index,
    linear_classifier_score,
    pmi_cooccurrence,
    zipf_fit,
)

__version__ = "0.1.0"
