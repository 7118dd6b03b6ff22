"""The reference's verbatim caption-cleaning corpus (VERDICT r14
item 3): shape, one-line wiring into the K5 RegexFilter, goldens on
reference-doc-style stock captions, and a parity pin against an
inline replica of the reference's ``replace_matches`` consumer
(`DPF/filters/texts/regex_filter.py:7-13`)."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from dataprocessingframework_spark.filters.regex_corpus import (
    EMOJI_REGEXS,
    ENG_REGEXS,
    RU_REGEXS,
    SPECIAL_REGEXS,
    reference_corpus,
)
from dataprocessingframework_spark.filters.text_filters import RegexFilter


def test_corpus_shape_and_compilability():
    assert len(RU_REGEXS) == 97
    assert len(ENG_REGEXS) == 103
    assert len(EMOJI_REGEXS) == 1
    assert len(SPECIAL_REGEXS) == 14
    for pat, repl in RU_REGEXS + ENG_REGEXS + EMOJI_REGEXS + SPECIAL_REGEXS:
        re.compile(pat)
        assert isinstance(repl, str)
    assert reference_corpus("ru") == RU_REGEXS
    assert reference_corpus("en") == ENG_REGEXS
    assert (
        reference_corpus("en", include_emoji=True, include_special=True)
        == ENG_REGEXS + EMOJI_REGEXS + SPECIAL_REGEXS
    )
    with pytest.raises(ValueError, match="ru.*en"):
        reference_corpus("de")


def _ours(samples: list[str], lang: str) -> list[str]:
    f = RegexFilter(text_column="text", rules=reference_corpus(lang))
    return f.process_pandas(pd.DataFrame({"text": samples}))[
        "clean_caption"
    ].tolist()


def test_goldens_en():
    """Stock-caption shapes from the reference docs: boilerplate
    (stock photo, getty, shutterstock, click-bait, resolutions,
    download) is stripped. Note the EN corpus's word-run rule
    ``(\\s*\\b[\\-a-z]+\\b\\s*){2,}`` removes runs of plain
    lowercase words too — that IS the reference's curated behavior,
    pinned here verbatim."""
    got = _ours(
        [
            "red sports car on mountain road stock photo 123456789",
            "royalty free stock image - cute kitten 1920x1080 hd video",
            "portrait of a woman getty images image 3 of 12",
            "vintage bicycle shutterstock download free",
        ],
        "en",
    )
    assert got == ["", "-", "12", ""]


def test_goldens_ru():
    got = _ours(
        [
            "детская кровать купить за 12990 руб. интернет-магазин мебели",
            "стоковое фото красивый закат над морем фото 42",
            "кожаная куртка размер 44-46 артикул 98765 авито",
            "телефон samsung 6.5x3.1x0.8 cm скачать обои бесплатно",
        ],
        "ru",
    )
    assert got == [
        "детская кровать  мебели",
        "красивый закат над морем",
        "кожаная куртка размер",
        "samsung",
    ]


# ---- parity vs the reference's consumer ------------------------------


def _replace_matches(caption: str, rx: re.Pattern, repl: str) -> str:
    # inline replica of DPF/filters/texts/regex_filter.py:7-13:
    # matches found on a lowered+stripped COPY, spans replayed onto
    # the ORIGINAL string
    for m in reversed(list(rx.finditer(str(caption).lower().strip()))):
        pos = list(m.span())
        caption = caption[: pos[0]] + repl + caption[pos[1] :]
    return caption


def _ref_clean(caption: str, rules: list[tuple[str, str]]) -> str:
    for pat, repl in rules:
        caption = _replace_matches(caption, re.compile(pat), repl)
    return caption


def test_parity_with_reference_consumer_on_normalized_input():
    """On already-lowercase, already-stripped captions the K5 filter
    with the verbatim corpus equals the reference's pipeline modulo
    the final outer strip — as long as no intermediate replacement
    introduces LEADING whitespace (there the reference replays spans
    computed on a re-stripped copy onto the unstripped string,
    shifting every span left; see the divergence test below)."""
    samples = {
        "en": [
            "red sports car on mountain road stock photo 123456789",
            "royalty free stock image - cute kitten 1920x1080 hd video",
            "portrait of a woman getty images image 3 of 12",
            "vintage bicycle shutterstock download free",
        ],
        "ru": [
            "детская кровать купить за 12990 руб. интернет-магазин мебели",
            "стоковое фото красивый закат над морем фото 42",
            "кожаная куртка размер 44-46 артикул 98765 авито",
            "телефон samsung 6.5x3.1x0.8 cm скачать обои бесплатно",
        ],
    }
    for lang, ss in samples.items():
        rules = reference_corpus(lang)
        for s, o in zip(ss, _ours(ss, lang)):
            assert o == _ref_clean(s, rules).strip(), (lang, s)


def test_documented_divergence_on_intermediate_leading_whitespace():
    """The one known delta (docs/migration.md): when an early rule's
    replacement leaves leading whitespace, the reference's span
    replay drifts left on every later rule. Pinned so the behavior
    (and the delta) stay loud."""
    s = "click here to view larger image | buy at www.example.com/shop"
    ours = _ours([s], "en")[0]
    ref = _ref_clean(s, reference_corpus("en"))
    assert ours == "|"
    assert ref == "buy "  # the reference's offset artifact
