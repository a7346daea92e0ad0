"""dataset_as_rdd: petastorm dataset -> RDD of decoded namedtuples
(parity: petastorm/spark_utils.py:23-52, S8).

Kept for API completeness; the DataFrame path (make_reader /
Reader.dataframe) is the primary surface — RDDs forgo Catalyst.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from petastorm_spark.etl.dataset_metadata import load_unischema
from petastorm_spark.unischema import Unischema, decode_row


def dataset_as_rdd(
    dataset_url: str,
    spark_session: SparkSession,
    schema_fields: list | None = None,
):
    """RDD of schema-view namedtuples with codecs decoded on executors."""
    schema = load_unischema(spark_session, dataset_url)
    df = spark_session.read.parquet(dataset_url)
    if schema is None:
        schema = Unischema.from_spark_schema(df.schema)
    view = schema.create_schema_view(schema_fields) if schema_fields else schema
    df = df.select(*view.field_names())

    nt = view.namedtuple_cls()
    field_names = view.field_names()

    def to_tuple(row):
        decoded = decode_row(row.asDict(), view)
        return nt(**{k: decoded[k] for k in field_names})

    return df.rdd.map(to_tuple)
