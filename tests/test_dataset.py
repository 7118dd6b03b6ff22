"""Dataset wrapper semantics (SURVEY §2.3-2.6)."""

import pytest
from pyspark.sql import functions as F

from dataprocessingframework_spark import Dataset


@pytest.fixture()
def ds(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "c", 40.0)],
        schema="id long, grp string, val double",
    )
    return Dataset(df)


def test_filter_count(ds):
    assert ds.filter(F.col("val") > 15).count() == 3


def test_select_prunes(ds):
    assert ds.select("id", "grp").columns == ["id", "grp"]


def test_rename_delete_protected(ds):
    renamed = ds.rename_columns({"val": "value"})
    assert "value" in renamed.columns and "val" not in renamed.columns
    with pytest.raises(ValueError):
        ds.delete_columns(["id"], protected=["id"])
    assert ds.delete_columns(["val"]).columns == ["id", "grp"]


def test_update_columns_replaces_overlap(ds):
    new = ds.df.select("id", (F.col("val") * 2).alias("val"))
    out = ds.update_columns(new, "id")
    rows = {r.id: r.val for r in out.df.collect()}
    assert rows == {1: 20.0, 2: 40.0, 3: 60.0, 4: 80.0}


def test_keep_first_dedup(ds):
    out = ds.drop_duplicates_keep_first(["grp"], "id")
    kept = sorted(r.id for r in out.df.collect())
    assert kept == [1, 2, 4]  # id=3 (grp 'a' again) dropped


def test_union_missing_columns(ds, spark):
    other = spark.createDataFrame([(9, "z")], schema="id long, grp string")
    out = ds.union(other)
    assert out.count() == 5
    assert out.df.filter(F.col("id") == 9).collect()[0].val is None


def test_offset_slice(ds):
    out = ds.order_by("id").offset(1).limit(2)
    assert [r.id for r in out.df.collect()] == [2, 3]


def test_summary_stats(ds):
    row = ds.summary_stats(["val"]).collect()[0]
    assert row["val_count"] == 4
    assert row["val_mean"] == 25.0
    assert row["val_min"] == 10.0 and row["val_max"] == 40.0


def test_row_id_and_split_range(ds):
    withid = ds.with_row_id("rid")
    total = withid.count()
    assert total == 4
    assert "rid" in withid.columns


def test_dataset_asof_and_salted_join_surface(spark):
    import datetime as dt

    from pyspark.sql import Row

    from dataprocessingframework_spark.dataset import Dataset

    def t(m):
        return dt.datetime(2024, 1, 1, 10, m)

    left = Dataset(
        spark.createDataFrame([Row(k="a", ts=t(5)), Row(k="a", ts=t(9))])
    )
    right = spark.createDataFrame([Row(k="a", ts=t(4), v=1.5)])
    out = left.asof_join(right, on="k").df.collect()
    assert [r.v for r in out] == [1.5, 1.5]
    s = left.salted_join(right.drop("ts", "v"), on="k", salt=4)
    assert s.count() == 2


def test_dataset_hash_sample_surface(spark, sf_dir):
    from dataprocessingframework_spark.dataset import Dataset

    orders = Dataset(spark.read.parquet(f"{sf_dir}/orders.parquet"))
    a = orders.hash_sample("o_orderkey", 1, 10).count()
    b = orders.hash_sample("o_orderkey", 1, 10).count()
    assert a == b and 0 < a < orders.count()


def test_dataset_delegation_surface(spark, sf_dir, tmp_path):
    """The façade exposes sinks, validation, profiling, and curation
    helpers so a reference user never drops below the Dataset API."""
    from dataprocessingframework_spark.dataset import Dataset

    docs = Dataset(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    r = docs.validate(required=["doc_id", "text"], key_cols=["doc_id"])
    assert r.total_errors == 0

    prof = docs.profile(columns=["n_chars"]).collect()[0]
    assert prof["n_rows"] == docs.count()

    hist = docs.histogram("n_chars", 0, 1000, 10)
    assert sum(r["cnt"] for r in hist.collect()) == docs.count()

    out = str(tmp_path / "docs.jsonl")
    docs.write_jsonl(out)
    assert spark.read.json(out).count() == docs.count()

    enriched = docs.analyze_text("text", "doc_id")
    assert "quality" in enriched.columns and "lang_pred" in enriched.columns

    cands = docs.near_dup_candidates("text", "doc_id", num_hashes=8, bands=2)
    assert {"id_a", "id_b"} <= set(cands.columns)


def test_approx_sketches_within_error_bounds(spark, sf_dir):
    from dataprocessingframework_spark import queries as q

    r = q.q_a_approx_sketches(spark, sf_dir).collect()[0]
    # 3 sigma of rsd=0.05 for HLL; 2% value tolerance for the
    # rank-1e-4 quantile sketch — the same bounds the DuckDB oracle
    # pins to TRUE (SQL_A_APPROX_SKETCHES)
    assert r.ok_orderkey and r.ok_partkey
    assert r.ok_p50 and r.ok_p99
    assert r.ed_orderkey > 0 and r.p50_exact > 0


def test_facade_round3_delegates(spark, tmp_path):
    from dataprocessingframework_spark.dataset import Dataset

    docs = Dataset(
        spark.createDataFrame(
            [(0, "alpha beta"), (1, "alpha gamma gamma")],
            schema="doc_id long, text string",
        )
    )
    assert docs.top_terms(k=1).count() == 2
    z = docs.zipf().collect()[0]
    assert z.n_terms == 3
    docs.write_table(str(tmp_path / "t_orc"), "orc")
    assert spark.read.orc(str(tmp_path / "t_orc")).count() == 2

    emb = Dataset(
        spark.createDataFrame(
            [(0, [1.0, 2.0], 0), (1, [3.0, 4.0], 0)],
            schema="vec_id long, embedding array<float>, label int",
        )
    )
    cents = {r.pos: r.centroid for r in emb.label_centroids().collect()}
    assert cents == {0: 2.0, 1: 3.0}


def test_facade_split_assign(spark):
    from dataprocessingframework_spark.dataset import Dataset

    ds = Dataset(spark.range(0, 100).withColumnRenamed("id", "k"))
    out = ds.split_assign("k").df
    assert "split" in out.columns
    assert out.count() == 100


def test_facade_round4_methods(spark):
    from pyspark.sql import functions as F

    from dataprocessingframework_spark.dataset import Dataset

    docs = Dataset(spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3, (i + 1) * 10) for i in range(20)],
        "doc_id long, text string, n_chars long",
    ))
    assert docs.weighted_sample("n_chars", "doc_id", k=5).count() == 5
    chunks = docs.chunk(window=4, stride=4)
    assert chunks.df.columns == ["doc_id", "n_chars", "chunk_id",
                                 "chunk_text", "n_tokens"]
    assert chunks.count() == 20 * 3  # 12 tokens / window 4
    cleaned = docs.remove_boilerplate(n=4, min_docs=2)
    assert cleaned.count() == 20  # every doc kept (as empty here)
    diff = docs.diff_against(
        docs.df.filter(F.col("doc_id") < 10), ["doc_id"], ["text"]
    )
    statuses = {r.status for r in diff.collect()}
    assert statuses == {"unchanged", "removed"}


def test_facade_near_dup_pairs_and_classify_quality(spark, sf_dir):
    from dataprocessingframework_spark.dataset import Dataset

    ds = Dataset(
        spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            "doc_id < 150"
        )
    )
    pairs = ds.near_dup_pairs("text", "doc_id", num_hashes=8, bands=4)
    assert set(pairs.columns) == {"id_a", "id_b", "jaccard"}
    assert pairs.filter("jaccard < 0.5").count() == 0

    scored = ds.classify_quality()
    assert set(scored.columns) == {"doc_id", "score", "keep"}
    assert scored.count() == ds.count()
