"""Text-analysis operators for training-data curation.

The reference ships model-backed text filters (LangFilter via py3langid,
`filters/texts/lang_filter.py`; RegexFilter, `filters/texts/
regex_filter.py`). Model weights aren't oracle-checkable, so the
engine's first tier is a family of *deterministic* heuristics built
entirely from JVM-side Column expressions (whole-stage codegen, no
Python in the hot path):

- token counting (whitespace tokenization),
- quality scoring (length / punctuation ratio / stopword ratio),
- language-ID by marker-word voting (n-gram-style heuristic),
- document fingerprinting (md5 of normalized text; the md5-based
  rolling primitive is shared with minhash, functions/hashing.py).

Every function is expressible 1:1 in DuckDB SQL, so all four are in the
oracle-checked query set. Model-backed equivalents (real langid, BPE
tokenizers) slot in as U1 ColumnFilters (filters/column_filter.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataprocessingframework_spark.functions.hashing import hash64

STOPWORDS_EN = ["the", "a", "an", "and", "of", "is", "to", "in"]

# marker-word vote tables; order = deterministic tie-break priority
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "les", "et", "une", "est"],
}

PUNCT_CLASS = "[.,!?;:]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties removed (array<string>)."""
    return F.filter(F.split(_c(col), " "), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# BPE-style pre-tokenizer: letter runs, digit runs, punctuation runs —
# the lookahead-free core of the GPT-2 pattern, restricted to ASCII
# classes so Java regex (Spark) and RE2 (DuckDB) agree and the count
# stays oracle-checkable. Real-subword counts are ~1.3x this; as a
# curation signal (tokens-per-doc budgeting) the run-level count is the
# standard cheap proxy.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(col: Column | str) -> Column:
    """Token count under a BPE-ish pre-tokenizer regex (JVM-side)."""
    return F.size(
        F.regexp_extract_all(_c(col), F.lit(BPE_TOKEN_PATTERN), F.lit(0))
    )


def char_count(col: Column | str) -> Column:
    return F.length(_c(col))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    c = _c(col)
    total = F.length(c)
    punct = total - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def _hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    hits = _hits(toks, stopwords or STOPWORDS_EN)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite heuristic in [0,1]: rewards reasonable length and
    stopword presence, penalizes punctuation soup. Deterministic."""
    n = token_count(col).cast("double")
    length_term = F.least(n / F.lit(20.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    return F.round((length_term + stop_term + punct_term) / 3.0, 4)


def lang_id(col: Column | str) -> Column:
    """Marker-word-vote language id ('unk' when no marker hits).

    Heuristic stand-in for the reference's LangFilter
    (`filters/texts/lang_filter.py:8-44`); ties break in LANG_MARKERS
    declaration order.
    """
    toks = tokens(col)
    hit_cols = {lang: _hits(toks, words) for lang, words in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.lit("unk")
    best_hits = F.lit(0)
    # iterate reversed so earlier languages win ties (>= replaces)
    for lang in reversed(langs):
        h = hit_cols[lang]
        take = h >= best_hits
        # strictly-greater for later langs is enforced by reversed order:
        # an earlier lang with equal hits overwrites later ones.
        best = F.when(take & (h > 0), F.lit(lang)).otherwise(best)
        best_hits = F.when(take, h).otherwise(best_hits)
    return best


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Shared primitive with the dedup sketches (functions/hashing.py)."""
    return F.md5(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def word_ngrams(col: Column | str, n: int) -> Column:
    """Word n-grams as space-joined strings (array<string>).

    Guarded: a doc with fewer than n tokens yields an EMPTY array.
    (Spark's ``sequence(1, 0)`` counts DOWN — it is not empty — so the
    short-doc case must be branched, not clamped.)
    """
    toks = tokens(col)
    ntok = F.size(toks)
    seq = F.sequence(F.lit(1), ntok - F.lit(n - 1))
    grams = F.transform(
        seq, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )
    return F.when(ntok >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    Keyword extraction for curation dashboards and topic-balance
    sampling (the reference surfaces per-document metadata columns the
    same way, `/root/reference/DPF/dataset_reader.py` column stages).

    Shape at 100 TB: one explode + groupBy(doc, term) with map-side
    partial counts; the document-frequency side reduces to vocabulary
    size (corpus-sublinear, Heaps' law) before joining back — the big
    tf side shuffles once on term, AQE broadcasts df when it lands
    small. Ranking is a window partitioned BY DOCUMENT — no global
    sort anywhere. tf stays integral and idf is a single ln() so the
    doubles are bit-reproducible against the DuckDB oracle.
    """
    toks = df.select(id_col, F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col,
            "term",
            F.round("tfidf", 4).alias("tfidf"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def zipf_slope(
    df: DataFrame, text_col: str = "text", top_n: int = 1000
) -> DataFrame:
    """Zipf rank-frequency slope of the corpus' top-n terms: the OLS
    slope of ln(freq) on ln(rank). Natural corpora sit near -1; a
    machine-generated or boilerplate-heavy corpus drifts — a cheap
    whole-corpus health signal (Gopher, Rae et al. 2021 §A1 uses the
    same distributional-sanity framing).

    Shape at 100 TB: wordcount groupBy (map-side combined), then
    orderBy().limit(top_n) — a distributed TakeOrdered, each partition
    keeps top_n then the driver merges — so ranking never funnels the
    vocabulary through one sort; the row_number window runs on ≤ top_n
    rows. slope = covar_pop/var_pop, the same estimator as DuckDB's
    regr_slope.
    """
    freq = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    ranked = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    # var_pop('x') == 0 when the corpus has a single distinct term —
    # emit an explicit 0.0 rather than a silent NULL-by-division
    return ranked.agg(
        F.when(
            F.var_pop("x") > 0,
            F.round(F.covar_pop("x", "y") / F.var_pop("x"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("zipf_slope"),
        F.count(F.lit(1)).alias("n_terms"),
    )


def unigram_nll(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus'
    own unigram distribution — the cheap fluency/outlier signal (a
    document of globally rare words scores high; boilerplate scores
    low). The degenerate-but-useful end of the KenLM-style
    perplexity-filter family (CCNet, Wenzek et al. 2019, public);
    model-backed perplexity slots in as a U1 ColumnFilter.

    Shape at 100 TB: word counts reduce to vocabulary size before
    joining back onto the per-doc words (AQE broadcasts when small),
    then one groupBy(doc) mean — the same two-reduction pattern as
    tfidf_top_terms; no global sort, corpus shuffled once on term.
    """
    toks = df.select(id_col, F.explode(tokens(text_col)).alias("term"))
    cnt = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n_total"))
    return (
        toks.join(cnt, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(-F.log(F.col("c") / F.col("n_total"))), 4
            ).alias("mean_nll"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def bigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document mean NLL under the corpus' own add-alpha-smoothed
    BIGRAM model: -mean_i ln((c(w_{i-1} w_i) + alpha) /
    (c(w_{i-1}) + alpha * V)). One step up the KenLM ladder from
    :func:`unigram_nll` — sensitive to word-ORDER scrambling that a
    unigram model cannot see (same public perplexity-filter family,
    CCNet / Wenzek et al. 2019). Docs with fewer than 2 tokens have no
    bigrams and are omitted.

    Shape at 100 TB: bigram and unigram counts each reduce to
    vocabulary-sized tables before joining back onto the per-doc
    bigram stream (two equi-joins, AQE broadcasts when small); V and
    nothing else crosses as a broadcast scalar; one final
    groupBy(doc) mean. No global sort, corpus shuffled once per count
    table.
    """
    toks = tokens(F.col(text_col))
    ntok = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(ntok - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(ntok - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("prev"), F.concat_ws(" ", x, y).alias("bg")),
    )
    bi = (
        df.filter(ntok >= 2)
        .select(F.col(id_col), F.explode(bigrams).alias("_b"))
        .select(id_col, F.col("_b.prev").alias("prev"), F.col("_b.bg").alias("bg"))
    )
    uni = df.select(F.explode(toks).alias("term")).groupBy("term").agg(
        F.count(F.lit(1)).alias("uc")
    )
    bc = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("bc"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    return (
        bi.join(bc, "bg")
        .join(uni, bi["prev"] == uni["term"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(
                    -F.log(
                        (F.col("bc") + F.lit(alpha))
                        / (F.col("uc") + F.lit(alpha) * F.col("v"))
                    )
                ),
                4,
            ).alias("mean_nll"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, public), adapted
    word-level because the synthetic corpus has no line structure:

    - ``distinct_word_ratio``: |distinct words| / |words| (type-token
      ratio; boilerplate-heavy docs score low),
    - ``top_word_fraction``: occurrences of the most frequent word /
      |words| (the "top n-gram fraction" family for n=1),
    - ``dup_bigram_fraction``: 1 - |distinct bigrams| / |bigrams|
      (fraction of repeated word-bigram instances).

    All three are per-row array expressions — a narrow projection with
    NO shuffle, so the pass is embarrassingly parallel at any scale.
    The per-row cost of ``top_word_fraction`` is O(d·n) (d = distinct
    words); for pathological single-row megadocs cap upstream with a
    length filter, not here.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    uniq = F.array_distinct(toks)
    top = F.array_max(
        F.transform(uniq, lambda w: F.size(F.filter(toks, lambda x: x == w)))
    )
    bi = word_ngrams(t, 2)
    nbi = F.size(bi)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.round(
            F.when(n > 0, F.size(uniq) / n).otherwise(F.lit(0.0)), 4
        ).alias("distinct_word_ratio"),
        F.round(
            F.when(n > 0, top / n).otherwise(F.lit(0.0)), 4
        ).alias("top_word_fraction"),
        F.round(
            F.when(nbi > 0, F.lit(1.0) - F.size(F.array_distinct(bi)) / nbi)
            .otherwise(F.lit(0.0)),
            4,
        ).alias("dup_bigram_fraction"),
    )


# PII patterns: ASCII-only, no lookarounds — identical semantics under
# Java regex (Spark) and RE2 (DuckDB), which keeps the scrub
# oracle-checkable. Order matters: emails first (they contain dots and
# digits that the looser patterns could nibble at).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4s / phone numbers; count each redaction type.

    Counterpart of the curation step every published web-scale text
    pipeline runs (C4, RefinedWeb). Pure ``regexp_replace`` /
    ``regexp_extract_all`` — JVM-side, codegen, no shuffle; at 100 TB
    this is a map-only pass fused into whatever scan precedes it.
    Output: ``<id>, n_email, n_ipv4, n_phone, scrubbed``.
    """
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = t
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per-doc count of distinct word
    n-grams shared with a benchmark set, plus a ``contaminated`` flag.

    The standard guard against test-set leakage into training data
    (GPT-3 appendix C / PaLM-style n-gram overlap, public method). Scale
    shape: the benchmark side collapses to DISTINCT n-grams — tiny by
    construction (benchmarks are KBs, corpora are TBs) — and is
    broadcast, so corpus n-grams are filtered map-side during their
    explode; the only shuffle is the final groupBy(doc_id) count, which
    partial-aggregates map-side. The corpus is never re-shuffled by
    n-gram.
    """
    grams = word_ngrams(F.col(text_col), n)
    c = (
        corpus.select(F.col(id_col), F.explode(grams).alias("_g"))
        .distinct()
    )
    b = (
        benchmark.select(F.explode(grams).alias("_g"))
        .distinct()
    )
    overlap = (
        c.join(F.broadcast(b), on="_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        corpus.select(id_col)
        .join(overlap, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= threshold).alias(
                "contaminated"
            ),
        )
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: int = 5,
    bits_log2: int = 22,
    num_hash: int = 2,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom-filter prefilter — same exact
    output, built for the regime where the benchmark n-gram set is too
    large to broadcast as strings.

    Plain ``decontaminate`` broadcasts the benchmark's DISTINCT n-gram
    STRINGS (fine for KB-sized benchmarks). When the "benchmark" is
    itself large — a held-out eval corpus, a blocklist of copyrighted
    passages, tens of millions of grams — broadcasting strings stops
    scaling. The classic fix is a Bloom filter: ~``2^bits_log2`` BITS
    of membership state regardless of gram length, false positives
    allowed because an EXACT verify join follows (a Bloom filter has
    no false negatives, so the final answer is bit-identical to the
    exact operator — which is why this shares decontaminate's oracle).

    Declarative Spark shape (no JVM sketch objects, no UDFs):

    1. benchmark grams -> ``num_hash`` salted 60-bit hashes -> bit
       positions mod ``2^bits_log2``; the DISTINCT position set is the
       "bit array", broadcast as a table of ints (8 B/row, bounded by
       ``2^bits_log2`` rows — vs unbounded gram strings).
    2. corpus grams keep only rows whose positions ALL hit the set:
       one broadcast LEFT SEMI join per hash function — map-side,
       before any corpus-side shuffle.
    3. survivors (true overlaps + ~0.1% false positives) equi-join the
       benchmark grams on the STRING for exact verification; both
       sides are now prefilter-sized, so this join shuffles almost
       nothing at any corpus size.

    At 100 TB: the corpus-side explode is filtered map-side to
    ~overlap volume before the groupBy(doc_id); the only full-corpus
    shuffle in the exact path (gram-string join) disappears.
    """
    if num_hash < 1:
        raise ValueError("num_hash must be >= 1")
    if not 8 <= bits_log2 <= 40:
        raise ValueError("bits_log2 must be in [8, 40]")
    grams = word_ngrams(F.col(text_col), n)
    c = corpus.select(F.col(id_col), F.explode(grams).alias("_g")).distinct()
    b = benchmark.select(F.explode(grams).alias("_g")).distinct()

    mod = F.lit(1 << bits_log2)

    def pos_expr(i: int, col: Column) -> Column:
        return hash64(F.concat(F.lit(f"bf{i}|"), col)) % mod

    filtered = c
    for i in range(num_hash):
        bits_i = b.select(pos_expr(i, F.col("_g")).alias("_p")).distinct()
        filtered = filtered.join(
            F.broadcast(bits_i),
            pos_expr(i, filtered["_g"]) == bits_i["_p"],
            "left_semi",
        )
    overlap = (
        filtered.join(b, on="_g")  # exact verify: kills false positives
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        corpus.select(id_col)
        .join(overlap, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= threshold).alias(
                "contaminated"
            ),
        )
    )


def remove_dup_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate removal: delete every ``n``-token
    passage that occurs in >= ``min_docs`` DISTINCT docs, preserving
    the order of what remains (CCNet-style paragraph dedup, public
    method — here on fixed ``n``-token tiles since the synthetic docs
    have no paragraph marks).

    Output: ``id_col``, ``clean_text`` (kept tiles rejoined in
    original order; '' when everything was boilerplate), ``n_removed``
    tiles. Every input doc appears exactly once.

    Scale shape: tiles explode narrowly (disjoint tiling, ~1 row per
    n tokens); the passage doc-frequency is ONE groupBy on the tile
    string with map-side partial agg, joined back tile-to-frequency as
    a plain equi-join (never doc-vs-doc); reassembly is one
    groupBy(id) whose per-doc state is the doc's own kept tiles. Three
    shuffles total, all linear in corpus token count.
    """
    from dataprocessingframework_spark.functions.partitioning import fan_out

    # skinny scans otherwise run the tile explode + md5 serially (and
    # the flagged relation forks into two consumers below)
    df = fan_out(df)
    toks = tokens(F.col(text_col))
    ntok = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(ntok, F.lit(1)), F.lit(n))
    tiles = (
        df.select(
            F.col(id_col),
            F.posexplode(starts).alias("_pos", "_s"),
            toks.alias("_t"),
        )
        .select(
            id_col,
            "_pos",
            F.array_join(F.slice(F.col("_t"), F.col("_s"), n), " ").alias("_p"),
        )
        # the doc-frequency side shuffles only this 8-byte hash, never
        # the n-word tile string (which rides along solely for the
        # reassembly agg); hash64 is md5-derived so the DuckDB oracle
        # computes the identical key
        .withColumn("_ph", hash64(F.col("_p")))
    )
    freq = (
        tiles.select(id_col, "_ph")
        .distinct()
        .groupBy("_ph")
        .agg(F.count(F.lit(1)).alias("_docs"))
    )
    flagged = tiles.join(freq, on="_ph")
    # single-pass reassembly: kept-tile text, kept count, and total
    # count come out of ONE doc-keyed aggregation — the flagged
    # relation is consumed once (the previous clean/totals split
    # computed the tile explode + frequency join twice and needed a
    # third, outer, join to reconcile). Every doc has >= 1 tile (the
    # tile starts sequence is never empty), so no doc can drop out.
    agg = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_tiles"),
        F.sum(
            F.when(F.col("_docs") < min_docs, 1).otherwise(0)
        ).alias("_n_kept"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("_pos"), F.col("_docs"), F.col("_p")
                            )
                        )
                    ),
                    lambda s: s["_docs"] < min_docs,
                ),
                lambda s: s["_p"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return agg.select(
        id_col,
        "clean_text",
        (F.col("_n_tiles") - F.col("_n_kept")).alias("n_removed"),
    )


def remove_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-SPAN removal at every token offset — the
    token-granular approximation of suffix-array ExactSubstr dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", public method). Unlike :func:`remove_dup_passages`
    (disjoint tiles), windows slide at stride 1, so a duplicated
    passage is caught at ANY alignment; overlapping/adjacent
    duplicated windows merge into maximal spans and every covered
    token is removed.

    Output per input doc: ``clean_text`` (surviving tokens in order),
    ``n_removed`` tokens, ``n_spans`` maximal removed regions.

    Scale shape: stride-1 grams explode ~1 row per token; duplicated-
    gram detection is one groupBy(gram) with map-side combine plus a
    semi-join back (both linear); span merging is a lag/cumsum window
    per doc (the sessionize pattern — one doc-keyed exchange); the
    reassembly joins each doc's merged-span ARRAY (spans, not tokens)
    back and filters positions in codegen. No pair explosion anywhere;
    cost is O(corpus tokens) per stage.
    """
    toks = tokens(F.col(text_col))
    grams = word_ngrams(F.col(text_col), n)
    # a skinny scan (single-row-group file, filtered input) would run
    # the per-token md5 explode below on ONE core — and twice, since
    # two consumers fork above it. fan_out pays one tiny shuffle so
    # both fork arms run cluster-wide off the reused exchange output
    # (no-op when the input already arrives wide)
    from dataprocessingframework_spark.functions.partitioning import fan_out

    df = fan_out(df)
    # grams are hashed to 64-bit at explode time: the three wide ops
    # over the gram relation (distinct, doc-frequency groupBy, semi-
    # join back) shuffle 8-byte longs instead of ~n-word strings —
    # ~8x fewer shuffle bytes on this, the heaviest text path. Nothing
    # downstream needs the gram text (only positions), and hash64 is
    # md5-derived so the DuckDB oracle hashes identically.
    occ = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(grams, lambda g: hash64(g))
        ).alias("_i", "_g"),
    )
    dupg = (
        occ.select(id_col, "_g")
        .distinct()
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_docs"))
        .filter(F.col("_docs") >= min_docs)
        .select("_g")
    )
    hits = occ.join(dupg, on="_g", how="left_semi").select(
        id_col, F.col("_i").alias("_s"), (F.col("_i") + n - 1).alias("_e")
    )
    w = Window.partitionBy(id_col).orderBy("_s")
    prev_max_end = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.select(
        id_col,
        "_s",
        "_e",
        F.when(
            prev_max_end.isNull() | (F.col("_s") > prev_max_end + 1), 1
        ).otherwise(0).alias("_new"),
    )
    spans = (
        flagged.withColumn("_span", F.sum("_new").over(w))
        .groupBy(id_col, "_span")
        .agg(F.min("_s").alias("_s"), F.max("_e").alias("_e"))
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_s"), F.col("_e")))
            ).alias("_spans")
        )
    )
    base = df.select(F.col(id_col), toks.alias("_t"))
    joined = base.join(spans, on=id_col, how="left").select(
        id_col,
        "_t",
        F.coalesce(
            F.col("_spans"),
            F.array().cast("array<struct<_s:int,_e:int>>"),
        ).alias("_spans"),
    )
    keep = F.filter(
        F.zip_with(
            F.col("_t"),
            F.sequence(F.lit(0), F.size("_t") - 1),
            lambda t, i: F.struct(t.alias("tok"), i.alias("idx")),
        ),
        lambda s: ~F.exists(
            F.col("_spans"),
            lambda sp: (sp["_s"] <= s["idx"]) & (s["idx"] <= sp["_e"]),
        ),
    )
    return joined.select(
        id_col,
        F.array_join(
            F.transform(keep, lambda s: s["tok"]), " "
        ).alias("clean_text"),
        F.aggregate(
            F.col("_spans"),
            F.lit(0),
            lambda acc, sp: acc + (sp["_e"] - sp["_s"] + F.lit(1)),
        ).cast("long").alias("n_removed"),
        F.size("_spans").cast("long").alias("n_spans"),
    )


def chunk_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Sliding-window document chunking: split each doc into
    ``window``-token chunks every ``stride`` tokens (overlap =
    window - stride), the context-length shaper for LLM pretraining
    and RAG ingestion.

    Output: all input columns except ``text_col``, plus ``chunk_id``
    (0-based, bigint), ``chunk_text`` and ``n_tokens`` (tokens in this
    chunk; the tail chunk may be short). A doc with no tokens yields
    ONE empty chunk, so no document silently disappears.

    Scale shape: chunk starts are per-row arithmetic
    (``sequence(1, max(n,1), stride)``) and the explode is narrow —
    the operator is map-only, costs no shuffle at any corpus size, and
    the output inherits the input partitioning. ``stride`` must be
    positive; ``window >= stride`` gives overlapping chunks,
    ``window == stride`` a disjoint tiling.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokens(F.col(text_col))
    ntok = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(ntok, F.lit(1)), F.lit(stride))
    passthrough = [c for c in df.columns if c != text_col]
    return (
        df.select(
            *passthrough,
            toks.alias("_t"),
            F.posexplode(starts).alias("_pos", "_s"),
        )
        .select(
            *passthrough,
            F.col("_pos").cast("long").alias("chunk_id"),
            F.array_join(F.slice(F.col("_t"), F.col("_s"), window), " ").alias(
                "chunk_text"
            ),
            F.least(
                F.size(F.col("_t")) - F.col("_s") + 1, F.lit(window)
            ).cast("int").alias("n_tokens"),
        )
    )


def duplicate_passage_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Passage-level duplication signal (Lee et al. 2021, public
    "Deduplicating Training Data" method, gram-level form): per doc,
    how many of its word n-grams also appear in ≥ ``min_docs-1`` OTHER
    docs, and the fraction of its n-grams that are such cross-doc
    repeats. High-fraction docs are boilerplate/templates.

    Shape: explode distinct (doc, gram) pairs → gram doc-frequency
    (one groupBy whose volume is map-side combined) → join back →
    per-doc counts. Both shuffles key on the gram; the doc-frequency
    side is reduced to one row per gram BEFORE the join-back, so the
    join is pair-vs-(gram,df) — never doc-vs-doc. At 100 TB the hot
    grams are exactly the duplicated ones (that's the signal), and the
    join-back is AQE-skew-splittable.
    """
    grams = word_ngrams(F.col(text_col), n)
    pairs = df.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("_g")
    )
    gram_df = pairs.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_df")
    )
    per_doc = (
        pairs.join(gram_df, on="_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("_df") >= min_docs, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_dup_grams"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0))
            .cast("long")
            .alias("n_grams"),
            F.coalesce(F.col("n_dup_grams"), F.lit(0))
            .cast("long")
            .alias("n_dup_grams"),
            F.round(
                F.when(
                    F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                    F.coalesce(F.col("n_dup_grams"), F.lit(0))
                    / F.col("n_grams"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("dup_fraction"),
        )
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    context_len: int = 1024,
    order_col: str | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """Deterministic sequence packing: assign docs to fixed
    ``context_len``-token bins by running token count, in a stable
    order — the batch-construction step between curation and training.

    ``bin_id = floor((cum_tokens - n_tokens) / context_len)`` (i.e. the
    bin where the doc STARTS; docs straddling a boundary belong to the
    bin they start in — the greedy streaming packing rule). A single
    global ordering would serialize at 100 TB, so the window is
    partitioned by a shard key (md5 bucket of the id): packing is
    per-shard, which is exactly how distributed loaders shard anyway.
    A training bin is identified by (shard, bin_id). Size ``n_shards``
    to at least the cluster's core count — each shard's running sum is
    one sorted window partition, so n_shards bounds packing
    parallelism and per-task sort size.
    """
    order = F.col(order_col) if order_col else F.col(id_col)
    shard = hash64(F.col(id_col).cast("string")) % F.lit(n_shards)
    ntok = token_count(F.col(text_col)).cast("long")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col), shard.alias("shard"), ntok.alias("n_tokens")
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "shard",
            "n_tokens",
            F.floor(
                (F.col("cum_tokens") - F.col("n_tokens"))
                / F.lit(context_len)
            )
            .cast("long")
            .alias("bin_id"),
        )
    )


def budget_mix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    token_budget: int = 2000,
) -> DataFrame:
    """Quality-weighted data mixing: per group (source/domain/lang),
    keep the highest-quality docs until a token budget is filled.

    The mixture-curation step of a training pipeline (C4/Pile-style
    source weighting, public recipe): docs are ranked by
    ``quality_score`` (ties broken by id so the cut is deterministic)
    and kept while the RUNNING token sum stays within ``token_budget``.

    One hash exchange on the group key, then a linear in-partition
    window scan — the same shape as any top-k-per-group. Group count is
    what bounds skew: per-source corpora at 100 TB are themselves
    large, so a hot source's partition holds that source's rows only;
    for single-source corpora partition the budget by (source, shard)
    upstream instead.
    """
    from pyspark.sql import Window

    q = quality_score(F.col(text_col))
    ntok = token_count(F.col(text_col)).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("quality"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(group_col),
            q.alias("quality"),
            ntok.alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= token_budget)
    )


def analyze(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All analyses in one narrow projection pass (no shuffle at all)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        char_count(t).alias("n_chars_computed"),
        F.round(punct_ratio(t), 4).alias("punct_ratio"),
        F.round(stopword_ratio(t), 4).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    threshold: float = 0.5,
) -> DataFrame:
    """fastText-style hashed-linear document scorer — the model-based
    quality gate of public LLM-data pipelines (Joulin et al. 2016
    fastText linear classifier over hashed bag-of-words; the filter
    family used by CCNet/DCLM-style curation).

    Word unigrams hash into ``n_buckets`` feature buckets; the doc
    score is sigmoid(mean bucket weight). Weights here are a
    DETERMINISTIC md5-derived stand-in in [-1, 1] (training is out of
    scope), which makes the full distributed scoring path
    oracle-checkable — production swaps the weight expression for a
    learned vector folded in as a literal array, same plan. The
    per-token weight is an INTEGER in [-1000, 1000] and the pool is an
    exact integer sum, so the score is order-independent and
    bit-identical across engines; only the final sigmoid is float.

    Output: ``id_col``, ``score`` (4 dp), ``keep`` (score >=
    threshold). Empty docs score sigmoid(0) = 0.5.

    Scale shape: entirely NARROW — tokenization, bucket hashing,
    weight lookup, and the mean-pool are array expressions inside
    whole-stage codegen; ZERO shuffle at any corpus size (the operator
    fuses into whatever scan precedes it).
    """
    score = F.round(hashed_linear_score_col(text_col, n_buckets), 4)
    return df.select(
        F.col(id_col),
        score.alias("score"),
        (score >= threshold).alias("keep"),
    )


def hashed_linear_score_col(
    text_col: Column | str, n_buckets: int = 1024
) -> Column:
    """The classifier score as a reusable COLUMN expression (unrounded)
    — composes into any projection or streaming gate (see
    :func:`hashed_linear_score` for semantics)."""
    toks = tokens(_c(text_col))
    w_int = lambda t: (  # noqa: E731 — weight(bucket(token)), integer
        hash64(
            F.concat(
                F.lit("qw|"),
                (hash64(t) % F.lit(n_buckets)).cast("string"),
            )
        )
        % F.lit(2001)
        - F.lit(1000)
    )
    total = F.aggregate(
        F.transform(toks, w_int), F.lit(0).cast("long"), lambda a, v: a + v
    )
    mean = F.when(F.size(toks) > 0, total / (F.size(toks) * 1000.0)).otherwise(
        F.lit(0.0)
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-mean))
