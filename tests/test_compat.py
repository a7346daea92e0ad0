"""petastorm drop-in signature compatibility."""

import warnings

import pytest

from petastorm_spark.reader import make_reader


def test_compat_kwargs_accepted_with_warning(spark, sf_dir):
    url = f"{sf_dir}/region.parquet"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        with make_reader(
            url,
            spark=spark,
            hdfs_driver="libhdfs3",
            results_queue_size=100,
            zmq_copy_buffers=True,
        ) as r:
            assert len(list(r)) == 5
        assert any("petastorm-compat" in str(x.message) for x in w)


def test_unknown_kwargs_rejected(spark, sf_dir):
    with pytest.raises(TypeError, match="unexpected reader arguments"):
        make_reader(f"{sf_dir}/region.parquet", spark=spark, not_a_real_arg=1)


def test_cache_type_local_disk(spark, sf_dir, tmp_path):
    with make_reader(
        f"{sf_dir}/region.parquet",
        spark=spark,
        cache_type="local-disk",
        cache_location=str(tmp_path / "cache"),
    ) as r:
        assert len(list(r)) == 5
    with pytest.raises(ValueError, match="unsupported cache_type"):
        make_reader(f"{sf_dir}/region.parquet", spark=spark, cache_type="redis")


def test_dataloader_shuffling_queue(spark, sf_dir):
    from petastorm_spark.bridges.torch import DataLoader
    from petastorm_spark.reader import make_batch_reader

    with DataLoader(
        make_batch_reader(
            f"{sf_dir}/customer.parquet", spark=spark, schema_fields=["c_custkey"]
        ),
        batch_size=32,
        shuffling_queue_capacity=8,
        shuffling_queue_seed=3,
    ) as loader:
        total = sum(len(b["c_custkey"]) for b in loader)
    assert total == spark.read.parquet(f"{sf_dir}/customer.parquet").count()
