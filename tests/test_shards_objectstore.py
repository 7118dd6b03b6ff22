"""Object-store backend for the dpf_shards lifecycle (r14 — VERDICT
r13 item 2): the same reader/writer/sink/compaction code runs against
``fakeobj://`` — a local-disk-backed store that ENFORCES object-store
semantics (whole-object atomic PUTs, copy+delete rename, GET-only
reads) so every commit-protocol decision that must survive S3-class
storage is exercised with real multi-process Spark tasks."""

import io
import os

import pytest

from dataprocessingframework_spark.sources.shard_fs import (
    FakeObjectStoreFS,
    LocalShardFS,
    get_fs,
    join,
    path_scheme,
    strip_file_scheme,
)
from dataprocessingframework_spark.sources.shards_source import (
    compact_shards,
    register_shards_source,
)


def _mk_media_df(spark, n=24):
    return spark.createDataFrame(
        [
            (f"img_{i:02d}.jpg", f'cap "q,\n{i}', i, bytes([i]) * 3)
            for i in range(n)
        ],
        schema="name string, caption string, k int, content binary",
    )


def test_fs_dispatch_and_path_helpers(tmp_path):
    assert path_scheme("/a/b") is None
    assert path_scheme("s3a://bucket/x") == "s3a"
    assert path_scheme("fakeobj:///x") == "fakeobj"
    assert isinstance(get_fs("/a/b"), LocalShardFS)
    assert isinstance(get_fs("fakeobj:///a"), FakeObjectStoreFS)
    assert join("fakeobj:///a/", "b", "c.csv") == "fakeobj:///a/b/c.csv"
    assert strip_file_scheme("file:///x/y") == "/x/y"
    assert strip_file_scheme("/x/y") == "/x/y"
    # fsspec-backed schemes fail loudly when fsspec is absent — and if
    # the env gains fsspec, they construct instead (both acceptable)
    try:
        get_fs("s3a://bucket/x")
    except ImportError as e:
        assert "fsspec" in str(e)


def test_fakeobj_semantics(tmp_path):
    """The semantics the lifecycle must tolerate: PUTs land whole,
    replace is copy-then-delete (both objects visible mid-flight),
    reads are GETs of the full object."""
    fs = FakeObjectStoreFS()
    root = f"fakeobj://{tmp_path}/store"
    fs.makedirs(root)
    fs.put_atomic(join(root, "a"), b"alpha")
    assert fs.read_bytes(join(root, "a")) == b"alpha"
    with fs.open_write(join(root, "b")) as h:
        h.write(b"be")
        h.write(b"ta")
        # not visible until close (the PUT hasn't happened)
        assert not fs.exists(join(root, "b"))
    assert fs.read_bytes(join(root, "b")) == b"beta"
    assert fs.local_path(join(root, "a")) is None  # no posix fast path
    buf = fs.open_read(join(root, "a"))
    assert isinstance(buf, io.BytesIO)  # a GET, seekable
    fs.replace(join(root, "a"), join(root, "c"))
    assert not fs.exists(join(root, "a"))
    assert fs.read_bytes(join(root, "c")) == b"alpha"
    assert sorted(fs.listdir(root)) == ["b", "c"]
    assert fs.atomic_rename is False
    with pytest.raises(FileNotFoundError):
        fs.remove(join(root, "nope"))


@pytest.fixture()
def obj_path(tmp_path):
    return f"fakeobj://{tmp_path}/shards"


def test_objectstore_writer_roundtrip_with_rolling(spark, tmp_path, obj_path):
    """The full DSv2 write→read round-trip over object semantics:
    commit-protocol temps are PUT as whole objects, commit 'renames'
    are copy+delete, and the reader GETs csvs and whole tars."""
    register_shards_source(spark)
    df = _mk_media_df(spark).repartition(1)
    (
        df.write.format("dpf_shards")
        .option("max_files_in_shard", "6")
        .mode("append")
        .save(obj_path)
    )
    backing = str(tmp_path / "shards")
    files = sorted(
        f for f in os.listdir(backing) if not f.startswith("_")
    )
    assert files == sorted(
        [f"{i}.csv" for i in range(4)] + [f"{i}.tar" for i in range(4)]
    )
    back = spark.read.format("dpf_shards").load(obj_path)
    assert back.rdd.getNumPartitions() == 4
    got = {
        r.name: (r.caption, r.k, bytes(r.content), r.is_correct)
        for r in back.collect()
    }
    want = {
        r.name: (r.caption, r.k, bytes(r.content), True)
        for r in df.collect()
    }
    assert got == want


def test_objectstore_append_overwrite_and_pruning(spark, obj_path):
    register_shards_source(spark)
    base = _mk_media_df(spark, 12).repartition(1)
    base.write.format("dpf_shards").option(
        "max_files_in_shard", "6"
    ).mode("append").save(obj_path)
    base.limit(6).repartition(1).write.format("dpf_shards").mode(
        "append"
    ).save(obj_path)
    df = spark.read.format("dpf_shards").load(obj_path)
    assert df.count() == 18
    # split_name pushdown prunes whole shard pairs on the object store
    assert df.where("split_name = '2'").count() == 6
    small = _mk_media_df(spark, 5).repartition(1)
    small.write.format("dpf_shards").mode("overwrite").save(obj_path)
    assert spark.read.format("dpf_shards").load(obj_path).count() == 5


def test_objectstore_stream_sink_exactly_once(spark, tmp_path, obj_path):
    """The exactly-once marker path over object semantics: markers are
    single PUTs (no rename available), a no-op restart appends
    nothing, and numbering stays contiguous across restarts."""
    register_shards_source(spark)
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    base = _mk_media_df(spark, 12)
    base.filter("k < 6").repartition(1).write.parquet(f"{src}/a.parquet")
    base.filter("k >= 6").repartition(1).write.parquet(f"{src}/b.parquet")

    def run():
        q = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
            .writeStream.format("dpf_shards")
            .option("path", obj_path)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    backing = str(tmp_path / "shards")
    shards = sorted(f for f in os.listdir(backing) if f.endswith(".csv"))
    assert len(shards) >= 2
    back = spark.read.format("dpf_shards").load(obj_path)
    got = {r.name: (r.k, bytes(r.content)) for r in back.collect()}
    assert got == {r.name: (r.k, bytes(r.content)) for r in base.collect()}
    assert not [f for f in os.listdir(backing) if f.endswith(".tmp")]

    run()  # no new data: nothing appended
    assert (
        sorted(f for f in os.listdir(backing) if f.endswith(".csv"))
        == shards
    )
    base.limit(3).repartition(1).write.parquet(f"{src}/c.parquet")
    run()
    assert spark.read.format("dpf_shards").load(obj_path).count() == 15


def test_objectstore_compaction_and_heal(spark, tmp_path, obj_path):
    """Two-phase compaction over object semantics: the manifest is a
    single-PUT publish, retire/rewrite arithmetic unchanged, and the
    crashed-compaction append protection (ADVICE r13 medium) holds —
    _next_shard_index_for folds the manifest's reservations on the
    object store too."""
    import json

    from dataprocessingframework_spark.sources.shards_source import (
        _COMPACTION_MANIFEST,
        _next_shard_index_for,
        heal_compaction,
    )

    register_shards_source(spark)
    df = _mk_media_df(spark, 24)
    for lo in range(0, 24, 4):
        df.filter(f"k >= {lo} and k < {lo + 4}").repartition(1).write.format(
            "dpf_shards"
        ).mode("append").save(obj_path)
    res = compact_shards(spark, obj_path, max_files_in_shard=12)
    assert res["retired"] == [str(i) for i in range(6)]
    assert res["new"] == ["6", "7"] and res["rows"] == 24
    back = spark.read.format("dpf_shards").load(obj_path)
    got = {r.name: (r.k, bytes(r.content)) for r in back.collect()}
    assert got == {r.name: (r.k, bytes(r.content)) for r in df.collect()}

    # crashed mid-rewrite: manifest reserves 8,9; appends must skip
    backing = str(tmp_path / "shards")
    with open(os.path.join(backing, _COMPACTION_MANIFEST), "w") as f:
        json.dump(
            {"state": "compacting", "retired": ["6", "7"],
             "pending": ["8", "9"]},
            f,
        )
    assert _next_shard_index_for(obj_path) == 10
    _mk_media_df(spark, 4).repartition(1).write.format("dpf_shards").mode(
        "append"
    ).save(obj_path)
    assert heal_compaction(obj_path) == "compacting"
    assert spark.read.format("dpf_shards").load(obj_path).count() == 28


def test_publish_shard_schema_on_object_store(spark, tmp_path):
    """The explicit schema repair works on object-store semantics
    too: driver-side header GETs over the seam, types from the first
    shard's arrow parse (the same trade the cold-read fallback makes
    on a scheme Spark can't glob), single-PUT publish."""
    from dataprocessingframework_spark.sources.shards_source import (
        publish_shard_schema,
        read_published_schema,
    )

    register_shards_source(spark)
    path = f"fakeobj://{tmp_path}/repair"
    _mk_media_df(spark, 12).repartition(1).write.format(
        "dpf_shards"
    ).option("max_files_in_shard", "6").option(
        "path", path
    ).mode("append").save()
    get_fs(path).remove(join(path, "_schema.json"))
    pub = publish_shard_schema(spark, path)
    assert {f.name for f in pub.fields} == {"name", "caption", "k"}
    assert read_published_schema(path) is not None
    back = (
        spark.read.format("dpf_shards").option("path", path).load()
    )
    assert back.count() == 12
