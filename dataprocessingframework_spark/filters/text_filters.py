"""U1 ColumnFilter instances for text metadata (K5/K6 analogues).

RegexFilter mirrors the *shape* of the reference's
`filters/texts/regex_filter.py:15-56` — an ordered list of
(pattern, replacement) applied to a caption column producing
``clean_caption`` — with an original, generic cleaning rule set (the
reference's curated RU/EN stock-caption corpus is its own content; we
ship our own rules, same contract, user-extensible).

Vectorized via pandas ``str.replace`` on Arrow batches; for rule sets
expressible as a single pass this collapses to JVM-side
``regexp_replace`` chains (see queries.py f5) — the pandas path exists
for big ordered corpora where per-rule chaining in Catalyst would blow
up the expression tree.
"""

from __future__ import annotations

import re
from typing import Any

import pandas as pd
from pyspark.sql.types import DoubleType, LongType, StringType  # noqa: F401

from dataprocessingframework_spark.filters.column_filter import ColumnFilter

# original, generic caption-cleaning rules (ordered)
DEFAULT_CLEAN_RULES: list[tuple[str, str]] = [
    (r"<[^>]+>", " "),                      # html tags
    (r"http[s]?://\S+", " "),               # urls
    (r"[#@]\w+", " "),                      # hashtags / mentions
    (r"(?i)\b(stock (photo|image|picture))\b", " "),
    (r"(?i)\b(royalty[- ]free|copyright|watermark)\b", " "),
    (r"[0-9]+x[0-9]+", " "),                # resolutions
    (r"\s+", " "),                          # whitespace collapse
]


class RegexFilter(ColumnFilter):
    """K5 — adds ``clean_caption`` from an ordered rule list.

    Two application modes (VERDICT r15 item 4):

    - ``preserve_case=False`` (default): the whole caption is
      lowered+stripped once, every rule rewrites that normalized
      string vectorized (`pandas str.replace`, backrefs expand), and
      the result is stripped. For input that is already lowercase and
      stripped this is byte-identical to the reference (goldens pin
      it).
    - ``preserve_case=True``: the reference's EXACT semantics
      (`DPF/filters/texts/regex_filter.py:8-13` ``replace_matches``),
      including its quirks: each rule matches against a FRESH
      lowered+stripped copy of the current caption but the matched
      spans are replayed in reverse onto the ORIGINAL string — case
      is preserved in unmatched regions, a caption with leading
      whitespace gets mis-offset spans (the strip shifts offsets),
      the replacement is spliced literally (no backref expansion),
      and no final strip is applied. Per-row Python loop, same cost
      shape as the reference's own row-at-a-time filter — prefer the
      vectorized default unless you need bit-identical mixed-case
      migration output.
    """

    def __init__(
        self,
        text_column: str = "text",
        rules: list[tuple[str, str]] | None = None,
        result_column: str = "clean_caption",
        preserve_case: bool = False,
    ) -> None:
        self.text_column = text_column
        self.rules = [(re.compile(p), r) for p, r in (rules or DEFAULT_CLEAN_RULES)]
        self.result_column = result_column
        self.preserve_case = preserve_case

    @property
    def columns_to_process(self) -> list[str]:
        return [self.text_column]

    @property
    def result_schema(self):
        return [(self.result_column, StringType())]

    def _clean_reference_exact(self, caption: str) -> str:
        """The reference's ``replace_matches`` fold, quirks intact
        (see class docstring)."""
        for pat, repl in self.rules:
            for m in reversed(list(pat.finditer(caption.lower().strip()))):
                a, b = m.span()
                caption = caption[:a] + repl + caption[b:]
        return caption

    def process_pandas(self, pdf: pd.DataFrame) -> pd.DataFrame:
        if self.preserve_case:
            out = [
                self._clean_reference_exact(str(t))
                for t in pdf[self.text_column]
            ]
            return pd.DataFrame(
                {self.result_column: out}, index=pdf.index
            )
        s = pdf[self.text_column].astype(str).str.lower().str.strip()
        for pat, repl in self.rules:
            s = s.str.replace(pat, repl, regex=True)
        return pd.DataFrame({self.result_column: s.str.strip()}, index=pdf.index)


class LangIdFilter(ColumnFilter):
    """K6 — adds ``lang``/``lang_score`` (`filters/texts/lang_filter.py:8-44`).

    With py3langid installed the real model runs; otherwise the
    deterministic marker-word heuristic (operators/text_analysis.py)
    stands in, same contract and schema.
    """

    def __init__(self, text_column: str = "text") -> None:
        self.text_column = text_column
        try:
            import py3langid  # noqa: F401

            self._have_model = True
        except ImportError:
            self._have_model = False

    @property
    def columns_to_process(self) -> list[str]:
        return [self.text_column]

    @property
    def result_schema(self):
        return [("lang", StringType()), ("lang_score", DoubleType())]

    def process_pandas(self, pdf: pd.DataFrame) -> pd.DataFrame:
        if self._have_model:
            from py3langid.langid import LanguageIdentifier, MODEL_FILE

            ident = LanguageIdentifier.from_pickled_model(
                MODEL_FILE, norm_probs=True
            )
            out = [ident.classify(str(t)) for t in pdf[self.text_column]]
            return pd.DataFrame(
                {"lang": [o[0] for o in out],
                 "lang_score": [round(float(o[1]), 3) for o in out]},
                index=pdf.index,
            )
        from dataprocessingframework_spark.operators.text_analysis import (
            LANG_MARKERS,
        )

        langs, scores = [], []
        for t in pdf[self.text_column]:
            toks = [x for x in str(t).split(" ") if x]
            hits = {
                lang: sum(1 for x in toks if x in set(ws))
                for lang, ws in LANG_MARKERS.items()
            }
            best = max(hits.items(), key=lambda kv: (kv[1], -list(LANG_MARKERS).index(kv[0])))
            if best[1] == 0:
                langs.append("unk")
                scores.append(0.0)
            else:
                langs.append(best[0])
                scores.append(round(best[1] / max(1, len(toks)), 3))
        return pd.DataFrame({"lang": langs, "lang_score": scores}, index=pdf.index)


class TokenStatsFilter(ColumnFilter):
    """Pandas-path twin of the JVM-side token stats (text_analysis.py) —
    demonstrates the row-contract fallback of U1."""

    def __init__(self, text_column: str = "text") -> None:
        self.text_column = text_column

    @property
    def columns_to_process(self) -> list[str]:
        return [self.text_column]

    @property
    def result_schema(self):
        return [("n_tokens_pd", LongType()), ("avg_token_len", DoubleType())]

    def process_sample(self, row: dict[str, Any]) -> list[Any]:
        from decimal import ROUND_HALF_UP, Decimal

        toks = [t for t in str(row[self.text_column]).split(" ") if t]
        n = len(toks)
        avg = (sum(len(t) for t in toks) / n) if n else 0.0
        # HALF_UP on the exact binary double — matches Spark/DuckDB
        # ROUND() (python's round() is banker's and disagrees on .5)
        avg = float(
            Decimal(avg).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        )
        return [n, avg]
