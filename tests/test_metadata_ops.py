"""V4 membership validators + W4 metadata write-back + fs helpers."""

import os
import tarfile

import pytest
from pyspark.sql import functions as F

from dataprocessingframework_spark.configs import ShardsDatasetConfig
from dataprocessingframework_spark.operators.validators import (
    membership_errors,
    tar_members,
)
from dataprocessingframework_spark.sources import DatasetReader
from dataprocessingframework_spark.sources.fs import join_path
from dataprocessingframework_spark.sources.writers import update_shard_metadata


@pytest.fixture()
def shards_dir(tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    import io

    for shard in range(2):
        with tarfile.open(d / f"{shard}.tar", "w") as tar:
            for i in range(2):
                data = f"payload {shard}-{i}".encode()
                info = tarfile.TarInfo(f"{shard}_{i}.img")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
        with open(d / f"{shard}.csv", "w") as f:
            f.write("image_name,caption\n")
            for i in range(2):
                f.write(f"{shard}_{i}.img,cap {shard}-{i}\n")
    return str(d)


def test_tar_members_listing(spark, shards_dir):
    rows = {(r.split_name, r.member) for r in tar_members(spark, shards_dir).collect()}
    assert rows == {
        ("0", "0_0.img"), ("0", "0_1.img"), ("1", "1_0.img"), ("1", "1_1.img"),
    }


def test_membership_clean_dataset(spark, shards_dir):
    ds = DatasetReader(spark).read(ShardsDatasetConfig(path=shards_dir))
    errs = membership_errors(spark, ds.df, shards_dir, "image_name")
    assert errs["rows_without_files"].count() == 0
    assert errs["files_without_rows"].count() == 0


def test_membership_detects_both_directions(spark, shards_dir):
    # add a metadata row with no file, leaving an existing file rowless
    with open(os.path.join(shards_dir, "0.csv"), "a") as f:
        f.write("ghost.img,phantom\n")
    ds = DatasetReader(spark).read(ShardsDatasetConfig(path=shards_dir))
    errs = membership_errors(spark, ds.df, shards_dir, "image_name")
    missing = [(r.split_name, r.member) for r in errs["rows_without_files"].collect()]
    assert missing == [("0", "ghost.img")]


def test_update_shard_metadata_rewrites_csvs_only(spark, shards_dir):
    tar_mtimes = {
        f: os.path.getmtime(os.path.join(shards_dir, f))
        for f in os.listdir(shards_dir)
        if f.endswith(".tar")
    }
    ds = DatasetReader(spark).read(ShardsDatasetConfig(path=shards_dir))
    new = ds.df.select(
        "image_name", F.upper("caption").alias("caption"), F.lit(1).alias("v")
    )
    summary = update_shard_metadata(spark, shards_dir, new, "image_name")
    assert summary.agg(F.sum("rows")).collect()[0][0] == 4
    back = DatasetReader(spark).read(ShardsDatasetConfig(path=shards_dir))
    caps = {r.image_name: (r.caption, r.v) for r in back.df.collect()}
    assert caps["0_0.img"] == ("CAP 0-0", 1)
    for f, m in tar_mtimes.items():
        assert os.path.getmtime(os.path.join(shards_dir, f)) == m  # untouched


def test_update_shard_metadata_integrity_prepass(spark, shards_dir):
    ds = DatasetReader(spark).read(ShardsDatasetConfig(path=shards_dir))
    dup = ds.df.select("image_name").union(ds.df.select("image_name")).withColumn(
        "x", F.lit(1)
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        update_shard_metadata(spark, shards_dir, dup, "image_name")
    alien = spark.createDataFrame([("nope.img", 2)], "image_name string, x int")
    with pytest.raises(ValueError, match="not present"):
        update_shard_metadata(spark, shards_dir, alien, "image_name")


def test_join_path_golden():
    assert join_path("s3a://bucket", "a/", "/b", "c.csv") == "s3a://bucket/a/b/c.csv"
    assert join_path("/local/dir/", "x.tar") == "/local/dir/x.tar"
