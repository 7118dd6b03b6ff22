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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
