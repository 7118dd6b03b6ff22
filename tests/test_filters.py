"""U1/U2/U4 contracts + deterministic kernels (reference
`tests/test_column_filters.py` / `tests/test_image_filters.py` model)."""

import numpy as np

from dataprocessingframework_spark.filters.kernels import (
    ImageInfoFilter,
    PHashFilter,
    decode_image,
    encode_fake_image,
    phash,
)
from dataprocessingframework_spark.filters.text_filters import (
    RegexFilter,
    TokenStatsFilter,
)
from dataprocessingframework_spark.filters.transforms import ImageResizeTransform
from dataprocessingframework_spark.functions.resizer import ResizePolicy


def _img_df(spark, include_bad=False):
    rng = np.random.RandomState(7)
    rows = [
        (f"img{i}", bytearray(encode_fake_image(
            rng.randint(0, 255, size=(6 + i, 8 + i, 3), dtype=np.uint8)
        )))
        for i in range(3)
    ]
    if include_bad:
        rows.append(("bad", bytearray(b"not an image")))
    return spark.createDataFrame(rows, schema="name string, content binary")


def test_fake_codec_roundtrip():
    arr = np.arange(60, dtype=np.uint8).reshape(5, 4, 3)
    out = decode_image(encode_fake_image(arr))
    assert np.array_equal(arr, out)


def test_image_info_filter(spark):
    """K1: all-correct golden (+ bad image -> is_correct False, error set),
    reference `tests/test_image_filters.py:11-28`."""
    df = _img_df(spark, include_bad=True)
    out = {r.name: r for r in ImageInfoFilter()(df).collect()}
    assert out["img0"].img_is_correct and out["img0"].width == 8
    assert out["img2"].height == 8 and out["img2"].channels == 3
    assert not out["bad"].img_is_correct
    assert out["bad"].img_error is not None
    # row count preserved — failed rows kept, never dropped
    assert len(out) == 4


def test_phash_deterministic_golden(spark):
    """K2: kernel golden + Spark-path equality."""
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 255, size=(32, 32, 3), dtype=np.uint8)
    h1, h2 = phash(arr), phash(arr)
    assert h1 == h2 and len(h1) == 16
    df = spark.createDataFrame(
        [("a", bytearray(encode_fake_image(arr)))], schema="name string, content binary"
    )
    row = PHashFilter()(df).collect()[0]
    assert row["image_phash_8"] == h1
    # near-identical image -> small hamming distance
    arr2 = arr.copy()
    arr2[0, 0] = 0
    d = bin(int(h1, 16) ^ int(phash(arr2), 16)).count("1")
    assert d <= 8


def test_regex_filter(spark):
    df = spark.createDataFrame(
        [(1, "Stock Photo <b>Cat</b> http://x.co 640x480  #cute")],
        schema="id int, text string",
    )
    out = RegexFilter()(df).collect()[0]
    assert out.clean_caption == "cat"
    assert out.text.startswith("Stock")  # passthrough preserved


def test_regex_filter_custom_ordered_corpus(spark):
    """docs/migration.md: a user ports the reference's regexs.py
    corpus by passing rules=. Order must be preserved — earlier
    replacements feed later patterns (rule 2 only matches the text
    produced by rule 1), exactly the reference's sequential loop."""
    df = spark.createDataFrame(
        [(1, "(c) 2021 PHOTO BANK beautiful cat")],
        schema="id int, text string",
    )
    rules = [  # input is lowercased+trimmed before the rule loop
        (r"\(c\)\s*\d{4}", "yeartag"),   # 1: rewrites into a marker
        (r"yeartag photo bank", " "),     # 2: matches rule 1's output
        (r"\s+", " "),
    ]
    out = RegexFilter(rules=rules)(df).collect()[0]
    assert out.clean_caption == "beautiful cat"
    # reversed order breaks rule 2's dependency -> marker survives
    out2 = RegexFilter(rules=[rules[1], rules[0], rules[2]])(df).collect()[0]
    assert "yeartag" in out2.clean_caption


def test_token_stats_row_contract(spark):
    df = spark.createDataFrame([(1, "aa bbb c")], schema="id int, text string")
    row = TokenStatsFilter()(df).collect()[0]
    assert row.n_tokens_pd == 3
    assert row.avg_token_len == 2.0


def test_resize_transform(spark):
    arr = np.arange(12 * 8 * 3, dtype=np.uint8).reshape(8, 12, 3)
    df = spark.createDataFrame(
        [("a", bytearray(encode_fake_image(arr)))], schema="name string, content binary"
    )
    t = ImageResizeTransform(ResizePolicy.MAX_SIZE, 6)
    row = t(df).collect()[0]
    assert (row.width, row.height) == (6, 4)
    out = decode_image(bytes(row.content))
    assert out.shape == (4, 6, 3)


def test_data_filter_batching(spark):
    """Batch seams must not affect results."""
    f = ImageInfoFilter()
    f.batch_size = 2
    df = _img_df(spark)
    widths = sorted(r.width for r in f(df).collect())
    assert widths == [8, 9, 10]
