"""Property-based checks (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dataprocessingframework_spark.filters.kernels import (
    decode_image,
    encode_fake_image,
    phash,
)
from dataprocessingframework_spark.functions.hashing import (
    MINHASH_PRIME,
    hash64_py,
    minhash_coeffs,
)
from dataprocessingframework_spark.functions.resizer import (
    ResizePolicy,
    resize_dims,
)

dims = st.integers(min_value=1, max_value=4000)
sizes = st.integers(min_value=1, max_value=2000)


@given(w=dims, h=dims, size=sizes)
def test_max_size_never_exceeds(w, h, size):
    nw, nh = resize_dims(w, h, ResizePolicy.MAX_SIZE, size)
    # rounding can overshoot by at most 1px on the non-anchor side
    assert max(nw, nh) <= size + 1
    assert nw >= 1 and nh >= 1


@given(w=dims, h=dims, size=sizes)
def test_min_size_downscale_only_never_upscales(w, h, size):
    nw, nh = resize_dims(w, h, ResizePolicy.MIN_SIZE, size, downscale_only=True)
    assert nw <= w and nh <= h


@given(w=dims, h=dims, size=sizes)
def test_aspect_ratio_preserved(w, h, size):
    nw, nh = resize_dims(w, h, ResizePolicy.MAX_SIZE, size)
    if min(w, h) >= 8 and min(nw, nh) >= 8:
        assert abs((w / h) - (nw / nh)) / (w / h) < 0.3


@given(st.text(max_size=200))
def test_hash64_range_and_determinism(s):
    a, b = hash64_py(s), hash64_py(s)
    assert a == b
    assert 0 <= a < 2**60


@given(st.integers(min_value=1, max_value=64))
def test_minhash_coeffs_valid(k):
    cs = minhash_coeffs(k)
    assert len(cs) == len(set(cs)) == k
    for a, b in cs:
        assert 1 <= a < MINHASH_PRIME
        assert 0 <= b < MINHASH_PRIME


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=8, max_value=64),
    h=st.integers(min_value=8, max_value=64),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_codec_roundtrip_and_phash_stable(w, h, seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_fake_image(arr)), arr)
    p = phash(arr)
    assert p == phash(arr)
    assert len(p) == 16 and int(p, 16) < 2**64


def test_char_ngram_python_parity(spark):
    """The JVM shingle expression equals the Python reference set for
    tricky inputs: unicode, repeats, shorter-than-n, exact-n."""
    cases = [
        "", "a", "ab", "abc", "abcd",
        "aaaa", "ab ab ab", "héllo wörld", "日本語のテキスト",
        "x" * 40, "tab\there", "mixed 日本 ascii",
    ]
    n = 3
    from dataprocessingframework_spark.operators.dedup import (
        tokenize_char_ngrams,
    )

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], ["doc_id", "text"]
    )
    got = {}
    for r in tokenize_char_ngrams(df, "text", "doc_id", n).collect():
        got.setdefault(r["doc_id"], set()).add(r["word"])
    for i, c in enumerate(cases):
        want = {c[j : j + n] for j in range(max(len(c) - n + 1, 0))}
        assert got.get(i, set()) == want, (c, got.get(i, set()), want)


def test_curation_signals_python_parity(spark):
    """JVM expressions vs python twins over seeded random ASCII texts:
    repetition metrics (Counter-based), BPE-ish token count (re), PII
    counts (re). One Spark job for the whole batch."""
    import random
    import re
    from collections import Counter

    from pyspark.sql import functions as F

    from dataprocessingframework_spark.operators import text_analysis as tx

    rng = random.Random(7)
    vocab = ["the", "cat", "dog", "a", "b,b", "x.y", "42", "it's", ""]
    rows = []
    for i in range(150):
        n = rng.randint(0, 25)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    rows += [(900, ""), (901, "   "), (902, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        r.doc_id: r
        for r in tx.repetition_metrics(df)
        .join(
            df.select(
                "doc_id",
                tx.bpe_token_count("text").alias("bpe"),
                F.size(
                    F.regexp_extract_all(
                        "text", F.lit(tx.PII_PATTERNS[0][1]), F.lit(0)
                    )
                ).alias("n_email"),
            ),
            "doc_id",
        )
        .collect()
    }
    bpe_re = re.compile(tx.BPE_TOKEN_PATTERN)
    email_re = re.compile(tx.PII_PATTERNS[0][1])
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t != ""]
        n = len(toks)
        cnt = Counter(toks)
        bis = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        r = got[doc_id]
        assert r.n_words == n
        assert r.distinct_word_ratio == round(len(cnt) / n, 4) if n else r.distinct_word_ratio == 0.0
        assert r.top_word_fraction == (round(max(cnt.values()) / n, 4) if n else 0.0)
        assert r.dup_bigram_fraction == (
            round(1.0 - len(set(bis)) / len(bis), 4) if bis else 0.0
        )
        assert r.bpe == len(bpe_re.findall(text))
        assert r.n_email == len(email_re.findall(text))
        for v in (r.distinct_word_ratio, r.top_word_fraction, r.dup_bigram_fraction):
            assert 0.0 <= v <= 1.0


def test_tfidf_python_parity_random_corpora(spark):
    """tfidf_top_terms agrees with a plain-python twin on random
    word-soup corpora (scores, ranks, tie-breaks)."""
    import math
    import random

    from pyspark.sql import functions as F  # noqa: F401

    from dataprocessingframework_spark.operators.text_analysis import (
        tfidf_top_terms,
    )

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(3):
        docs = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(1, 15))))
            for i in range(8)
        ]
        df = spark.createDataFrame(docs, schema="doc_id long, text string")
        got = {
            (r.doc_id, r.rnk): (r.term, r.tfidf)
            for r in tfidf_top_terms(df, k=2).collect()
        }
        # python twin
        tf: dict[tuple[int, str], int] = {}
        for i, text in docs:
            for w in text.split():
                tf[(i, w)] = tf.get((i, w), 0) + 1
        dfreq: dict[str, int] = {}
        for (_, w) in tf:
            dfreq[w] = dfreq.get(w, 0) + 1
        n = len(docs)
        want = {}
        for i, _ in docs:
            scored = sorted(
                (
                    (-tf[(i, w)] * math.log(n / dfreq[w]), w)
                    for (d, w) in tf
                    if d == i
                ),
            )
            for rnk, (neg, w) in enumerate(scored[:2], start=1):
                want[(i, rnk)] = (w, round(-neg, 4))
        assert got == want, trial


def test_zipf_slope_is_negative_and_bounded(spark):
    """Any corpus with a strictly decreasing rank-frequency curve has
    a negative slope; a perfectly uniform corpus has slope 0."""
    from dataprocessingframework_spark.operators.text_analysis import (
        zipf_slope,
    )

    uniform = spark.createDataFrame(
        [(0, "a b c d e")], schema="doc_id long, text string"
    )
    assert zipf_slope(uniform).collect()[0].zipf_slope == 0.0

    decreasing = spark.createDataFrame(
        [(0, " ".join(["x"] * 8 + ["y"] * 4 + ["z"] * 2))],
        schema="doc_id long, text string",
    )
    s = zipf_slope(decreasing).collect()[0].zipf_slope
    assert s < 0


def test_chunk_windows_python_parity_random_docs(spark):
    """Python-twin parity for the chunker over random docs (incl. the
    empty doc), for several (window, stride) shapes — one Spark call
    per shape, all docs batched."""
    import random

    from pyspark.sql import functions as F  # noqa: F401

    from dataprocessingframework_spark.operators.text_analysis import (
        chunk_windows,
    )

    rng = random.Random(7)
    docs = []
    for i in range(30):
        n = rng.choice([0, 1, 2, 3, 5, 8, 13, 21, 34])
        docs.append((i, " ".join(f"t{i}_{j}" for j in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def py_chunks(text, window, stride):
        toks = [t for t in text.split(" ") if t]
        out = []
        s = 0
        while True:
            out.append((len(out), " ".join(toks[s:s + window]),
                        max(0, min(len(toks) - s, window))))
            s += stride
            if s >= max(len(toks), 1):
                break
        return out

    for window, stride in [(4, 4), (5, 3), (1, 1), (8, 2)]:
        got = {}
        for r in chunk_windows(df, window=window, stride=stride).collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.chunk_text, r.n_tokens)
            )
        for i, text in docs:
            expected = py_chunks(text, window, stride)
            assert sorted(got[i]) == expected, (window, stride, i)


def test_snapshot_diff_partitions_keyspace(spark):
    """diff(a, a) is all-unchanged; statuses always partition the
    union of both keyspaces."""
    from dataprocessingframework_spark.operators.versioning import (
        snapshot_diff,
    )

    a = spark.createDataFrame(
        [(i, f"v{i % 5}") for i in range(40)], "k long, v string"
    )
    same = snapshot_diff(a, a, ["k"], ["v"])
    assert same.count() == 40
    assert {r.status for r in same.collect()} == {"unchanged"}

    b = spark.createDataFrame(
        [(i, f"v{i % 3}") for i in range(20, 60)], "k long, v string"
    )
    d = {r.k: r.status for r in snapshot_diff(a, b, ["k"], ["v"]).collect()}
    assert set(d) == set(range(60))  # every key classified exactly once
    assert all(d[k] == "removed" for k in range(20))
    assert all(d[k] == "added" for k in range(40, 60))
    assert all(d[k] in ("changed", "unchanged") for k in range(20, 40))


def test_weighted_sample_is_subset_and_exhaustive_when_k_large(spark):
    from pyspark.sql import functions as F

    from dataprocessingframework_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(50)], "id long, w long"
    )
    got = [r.id for r in weighted_sample(df, "w", "id", k=10).collect()]
    assert len(got) == 10 and len(set(got)) == 10  # without replacement
    assert set(got) <= set(range(50))
    # k >= n returns every positive-weight row
    all_rows = weighted_sample(df, "w", "id", k=100).count()
    assert all_rows == 50
    # sample is invariant to adding an irrelevant column
    got2 = [
        r.id
        for r in weighted_sample(
            df.withColumn("junk", F.lit("x")), "w", "id", k=10
        ).collect()
    ]
    assert sorted(got) == sorted(got2)


def test_gini_python_twin_random_multisets(spark):
    """Spark gini == the sorted-rank formula computed in numpy, over
    random multisets (ties included)."""
    import random

    import numpy as np

    from dataprocessingframework_spark.operators.drift import gini

    rng = random.Random(11)
    for case in range(4):
        vals = [float(rng.randint(0, 12)) for _ in range(rng.randint(5, 60))]
        if sum(vals) == 0:
            vals[0] = 1.0
        x = np.sort(np.array(vals))
        n = len(x)
        expected = round(
            float(2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum())
                  - (n + 1) / n), 6)
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = gini(df, "x").collect()[0]
        assert got.n == n
        assert abs(got.gini - expected) <= 1e-6, (case, vals)


def test_ks_python_twin_random_samples(spark):
    import random

    from dataprocessingframework_spark.operators.drift import ks_statistic

    rng = random.Random(13)
    for case in range(3):
        a = [rng.randint(0, 20) for _ in range(rng.randint(5, 40))]
        b = [rng.randint(5, 25) for _ in range(rng.randint(5, 40))]

        def ecdf(s, v):
            return sum(1 for x in s if x <= v) / len(s)

        expected = round(
            max(abs(ecdf(a, v) - ecdf(b, v)) for v in set(a) | set(b)), 6
        )
        da = spark.createDataFrame([(v,) for v in a], "x long")
        db = spark.createDataFrame([(v,) for v in b], "x long")
        got = ks_statistic(da, db, "x").collect()[0]
        assert got.ks_d == expected, (case, a, b)


def test_interval_overlap_join_python_twin_random(spark):
    """Binned+first-bin-dedup overlap join == brute-force python
    overlap set, over random interval families and bin widths."""
    import random

    from dataprocessingframework_spark.operators.joins import (
        interval_overlap_join,
    )

    rng = random.Random(17)
    for case, width in [(0, 7), (1, 50), (2, 1000)]:
        ls = []
        for i in range(rng.randint(3, 25)):
            lo = rng.randint(0, 500)
            ls.append((i, lo, lo + rng.randint(0, 120)))
        rs = []
        for j in range(rng.randint(3, 25)):
            lo = rng.randint(0, 500)
            rs.append((j, lo, lo + rng.randint(0, 120)))
        expected = sorted(
            (li, rj)
            for li, ll, lh in ls
            for rj, rl, rh in rs
            if ll <= rh and rl <= lh
        )
        left = spark.createDataFrame(ls, "lid long, l_lo long, l_hi long")
        right = spark.createDataFrame(rs, "rid long, r_lo long, r_hi long")
        got = sorted(
            (r.lid, r.rid)
            for r in interval_overlap_join(
                left, right, "l_lo", "l_hi", "r_lo", "r_hi", bin_width=width
            ).collect()
        )
        assert got == expected, (case, width)


def test_jaccard_pairs_python_parity_random_corpora(spark):
    """Pair-driven candidate verification against pure-Python ground
    truth on random word-soup corpora: for every candidate pair, the
    reported Jaccard must equal the set computation exactly (and pairs
    below threshold or with empty intersection must be absent)."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from dataprocessingframework_spark.operators.dedup import jaccard_pairs

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(0, 25))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, schema="doc_id long, text string")
    # candidates: a random subset of all pairs, with duplicates thrown
    # in to exercise the dedup guard
    all_pairs = list(itertools.combinations(range(40), 2))
    cand_list = rng.sample(all_pairs, 200)
    cand = spark.createDataFrame(
        cand_list + cand_list[:50], schema="id_a long, id_b long"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(
            df, "text", "doc_id", threshold=0.2, candidates=cand
        ).collect()
    }
    sets = {i: set(t.split()) for i, t in docs}
    want = {}
    for a, b in set(cand_list):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter >= 1 and union > 0 and inter / union >= 0.2:
            want[(a, b)] = round(inter / union, 4)
    assert got == want


def test_hashed_linear_score_python_parity(spark):
    """Classifier scores against a pure-Python reimplementation of the
    hashed-weight model — independent of both Spark and DuckDB."""
    import math
    import random

    from dataprocessingframework_spark.functions.hashing import hash64_py
    from dataprocessingframework_spark.operators.text_analysis import (
        hashed_linear_score,
    )

    rng = random.Random(3)
    vocab = [f"tok{i}" for i in range(50)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(0, 30))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, schema="doc_id long, text string")
    got = {r.doc_id: r.score for r in hashed_linear_score(df).collect()}
    for i, text in docs:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            expect = 0.5
        else:
            total = sum(
                hash64_py(f"qw|{hash64_py(t) % 1024}") % 2001 - 1000
                for t in toks
            )
            expect = 1.0 / (1.0 + math.exp(-(total / (len(toks) * 1000.0))))
        assert got[i] == round(expect, 4), (i, got[i], expect)


def test_incremental_semantic_dedup_python_parity(spark):
    """r8: the IVF-cell-blocked cosine gate against a pure-numpy twin
    on random corpora — a batch row survives iff NO corpus vector
    sharing one of its n_probe nearest cells reaches the threshold
    (note: blocked semantics, NOT plain max-cosine — a high-cosine
    pair in unprobed cells must be ignored by both sides)."""
    import numpy as np

    from dataprocessingframework_spark.operators import similarity

    rng = np.random.RandomState(17)
    for trial in range(3):
        dim, n_corpus, n_batch, n_cells, n_probe = 12, 40, 15, 6, 2
        cvecs = rng.randn(n_corpus, dim)
        # plant some batch rows as near-copies of corpus rows
        bvecs = rng.randn(n_batch, dim)
        for j in range(0, n_batch, 3):
            bvecs[j] = cvecs[(j * 7) % n_corpus] * 1.5 + rng.randn(dim) * 0.01
        cents = [list(map(float, rng.randn(dim))) for _ in range(n_cells)]
        threshold = 0.9

        # Spark stores array<float>: round inputs to float32 first,
        # then compute in float64 — exactly what the JVM side does
        cmat = np.asarray(cvecs, dtype=np.float32).astype(np.float64)
        bmat = np.asarray(bvecs, dtype=np.float32).astype(np.float64)
        kmat = np.asarray(cents, dtype=np.float64)

        def cells(v, p):
            sims = kmat @ v
            order = np.argsort(-sims, kind="stable")
            return set(order[:p].tolist())

        c_cell = [cells(cmat[i], 1) for i in range(n_corpus)]
        expected = []
        for j in range(n_batch):
            probed = cells(bmat[j], n_probe)
            dup = False
            for i in range(n_corpus):
                if c_cell[i] & probed:
                    cos = float(
                        cmat[i] @ bmat[j]
                        / (np.linalg.norm(cmat[i]) * np.linalg.norm(bmat[j]))
                    )
                    if cos >= threshold:
                        dup = True
                        break
            if not dup:
                expected.append(1000 + j)

        corpus = spark.createDataFrame(
            [(i, [float(x) for x in cvecs[i]]) for i in range(n_corpus)],
            schema="vec_id long, embedding array<float>",
        )
        batch = spark.createDataFrame(
            [(1000 + j, [float(x) for x in bvecs[j]]) for j in range(n_batch)],
            schema="vec_id long, embedding array<float>",
        )
        kept = similarity.incremental_semantic_dedup(
            batch, corpus, cents,
            threshold=threshold, n_probe=n_probe,
        )
        got = sorted(r.vec_id for r in kept.collect())
        assert got == sorted(expected), (trial, got, expected)
        # the blas (cogrouped per-cell matmul) scoring path must
        # agree with the JVM fold away from last-ulp boundaries
        got_blas = sorted(
            r.vec_id
            for r in similarity.incremental_semantic_dedup(
                batch, corpus, cents,
                threshold=threshold, n_probe=n_probe, impl="blas",
            ).collect()
        )
        assert got_blas == got, (trial, got_blas, got)


def test_kcenter_select_python_parity(spark):
    """r8: the greedy k-center trajectory against a pure-numpy twin on
    random corpora — same md5-hash-min seed, same cosine-distance
    update, same (dist DESC, id ASC) tiebreak. Triangulates the Spark
    implementation independently of the DuckDB oracle."""
    import numpy as np

    from dataprocessingframework_spark.functions.hashing import hash64_py
    from dataprocessingframework_spark.operators import similarity

    rng = np.random.RandomState(29)
    for trial in range(3):
        n, dim, k = 60, 12, 6
        vecs = rng.randn(n, dim).astype(np.float32)
        ids = [int(i * 3 + 1) for i in range(n)]  # non-contiguous ids
        mat = vecs.astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)

        def cdist(i, j):
            return 1.0 - float(
                mat[i] @ mat[j] / (norms[i] * norms[j])
            )

        seed_pos = min(range(n), key=lambda i: (hash64_py(str(ids[i])), ids[i]))
        chosen = [(0, ids[seed_pos], 2.0)]
        mind = {i: cdist(i, seed_pos) for i in range(n) if i != seed_pos}
        while len(chosen) < k and mind:
            # argmax by (dist DESC, id ASC)
            pick = max(mind, key=lambda i: (mind[i], -ids[i]))
            chosen.append((len(chosen), ids[pick], round(mind[pick], 4)))
            del mind[pick]
            for i in list(mind):
                mind[i] = min(mind[i], cdist(i, pick))

        df = spark.createDataFrame(
            [(ids[i], [float(x) for x in vecs[i]]) for i in range(n)],
            schema="vec_id long, embedding array<float>",
        )
        got = [
            (r.sel_rank, r.vec_id, r.dist)
            for r in similarity.kcenter_select(df, k=k)
            .orderBy("sel_rank")
            .collect()
        ]
        want = [(r, i, round(d, 4)) for r, i, d in chosen]
        assert [(a, b) for a, b, _ in got] == [
            (a, b) for a, b, _ in want
        ], (trial, got, want)
        for (_, _, gd), (_, _, wd) in zip(got, want):
            assert abs(gd - wd) < 2e-4, (trial, got, want)


def test_sq8_pack_python_parity_random(spark):
    """r11: the SQ8 code+pack expression layer against a pure-numpy
    twin on random float32 corpora — per-dim floor codes with both
    clamp rails, 7 codes per bigint word, degenerate (mx<=mn) dims
    coding 0. Catches any drift in the shift/floor arithmetic that
    the DuckDB-oracled registry query would otherwise only catch a
    round later."""
    import numpy as np

    from dataprocessingframework_spark.operators.similarity import (
        _SQ8_PER_WORD,
        SQ8_LEVELS,
        _sq8_pack_expr,
    )

    rng = np.random.RandomState(99)
    for trial, dim in enumerate((8, 13, 21)):  # non-multiples of 7 too
        vecs = (rng.randn(30, dim) * 3).astype(np.float32)
        mins = vecs.min(axis=0).astype(np.float64).tolist()
        maxs = vecs.max(axis=0).astype(np.float64).tolist()
        # plant a degenerate dim and out-of-range batch values
        mins[1] = maxs[1] = 0.5
        vecs[3, 0] = 1e6
        vecs[4, 0] = -1e6
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(30)],
            schema="vec_id long, embedding array<float>",
        )
        got = {
            r.vec_id: list(r.codes)
            for r in df.select(
                "vec_id",
                _sq8_pack_expr("embedding", mins, maxs).alias("codes"),
            ).collect()
        }
        for i in range(30):
            v = vecs[i].astype(np.float64)
            want_codes = []
            for d in range(dim):
                if maxs[d] <= mins[d]:
                    want_codes.append(0)
                else:
                    c = int(
                        np.floor(
                            (v[d] - mins[d])
                            / (maxs[d] - mins[d])
                            * SQ8_LEVELS
                        )
                    )
                    want_codes.append(max(0, min(SQ8_LEVELS - 1, c)))
            want_words = []
            for w in range(0, dim, _SQ8_PER_WORD):
                word = 0
                for j, d in enumerate(
                    range(w, min(w + _SQ8_PER_WORD, dim))
                ):
                    word |= want_codes[d] << (8 * j)
                want_words.append(word)
            assert got[i] == want_words, (trial, i, got[i], want_words)


def test_pq_code_exprs_python_parity_random(spark):
    """r11: the PQ per-subspace argmin code expressions against a
    numpy twin on random vectors and random codebooks — squared-L2
    argmin with ties to the lower codeword, m subspaces of dim/m.
    The jvm expression path is the oracle-exact encoder, so its
    arithmetic must match plain numpy exactly away from distance
    ties (random doubles: measure-zero)."""
    import numpy as np

    from dataprocessingframework_spark.operators.similarity import (
        _pq_code_exprs,
    )

    rng = np.random.RandomState(123)
    for trial in range(3):
        m, sd, k = 4, 5, 9
        dim = m * sd
        books = [
            [[float(x) for x in rng.randn(sd)] for _ in range(k)]
            for _ in range(m)
        ]
        vecs = rng.randn(25, dim)
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(25)],
            schema="vec_id long, embedding array<double>",
        )
        exprs = _pq_code_exprs("embedding", books)
        got = {
            r.vec_id: [r[f"c{s}"] for s in range(m)]
            for r in df.select(
                "vec_id",
                *[e.alias(f"c{s}") for s, e in enumerate(exprs)],
            ).collect()
        }
        for i in range(25):
            want = []
            for s in range(m):
                sub = vecs[i, s * sd : (s + 1) * sd]
                C = np.array(books[s])
                d = ((C - sub[None, :]) ** 2).sum(axis=1)
                want.append(int(np.argmin(d)))  # first min = lower k
            assert got[i] == want, (trial, i, got[i], want)


def test_balance_centroids_invariants_random(spark):
    """r12 property check over random corpora: whatever the data
    shape, balance_centroids must (a) preserve total mass — every
    nonzero row lands in exactly one cell of the returned quantizer;
    (b) never shrink the centroid list; (c) be deterministic — two
    runs over the same input return the identical list (the whole
    trajectory is hash-seeded, no RNG); (d) never worsen the max
    cell beyond the starting assignment."""
    import numpy as np

    from dataprocessingframework_spark.operators.similarity import (
        _ivf_centroids,
        assign_cells,
        balance_centroids,
        norm,
    )
    from pyspark.sql import functions as F

    for trial, (n, sigma, n_cells) in enumerate(
        [(120, 0.5, 3), (200, 4.0, 5), (80, 0.01, 2)]
    ):
        rng = np.random.RandomState(100 + trial)
        centers = rng.randn(6, 12) * 8.0
        cl = rng.randint(0, 6, size=n)
        vecs = centers[cl] + rng.randn(n, 12) * sigma
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
        rows.append((n, [0.0] * 12))  # zero-norm row: excluded
        df = spark.createDataFrame(
            rows, schema="vec_id long, embedding array<double>"
        )
        cents0 = _ivf_centroids(
            df, "vec_id", "embedding", n_cells, iters=0
        )
        cap = max(1, n // (2 * n_cells))
        bal1 = balance_centroids(df, cents0, cap, rounds=4)
        bal2 = balance_centroids(df, cents0, cap, rounds=4)
        assert bal1 == bal2, trial  # deterministic trajectory
        assert len(bal1) >= len(cents0), trial
        nz = df.select(
            F.col("vec_id").alias("bid"),
            F.col("embedding").alias("bv"),
            norm(F.col("embedding")).alias("bn"),
        ).filter(F.col("bn") > 0)

        def sizes(cents):
            return [
                r.n
                for r in assign_cells(nz, cents, "bid", "bv")
                .groupBy("cell")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            ]

        s0, s1 = sizes(cents0), sizes(bal1)
        assert sum(s1) == sum(s0) == n, trial  # mass preserved
        assert max(s1) <= max(s0), trial  # never worse
