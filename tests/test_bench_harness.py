"""bench.py harness policies that must not regress — pure helpers,
no SparkSession needed."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    CONTAMINATION_SPREAD,
    TIERS,
    bench_queries,
    resolve_contamination,
    trial_spread,
)


def test_trial_spread_flags_planted_outlier():
    """r12 (VERDICT r11 item 5): the exact contention signature seen
    in BENCH_r10/r11 (one 3-30x outlier trial among settled ones)
    must trip the mechanical detector; a settled set must not."""
    assert trial_spread([2.9, 11.1, 30.6, 2.5, 2.0, 2.0]) > \
        CONTAMINATION_SPREAD  # text_remove_dup_spans, BENCH_r11
    assert trial_spread([2.0, 2.1, 2.4]) < CONTAMINATION_SPREAD
    assert trial_spread([0.5, 0.9, 0.6]) < CONTAMINATION_SPREAD
    # deliberately NOT flagged: the borderline single-outlier shape
    # (pipeline_curation_v2, BENCH_r11) sits under 3x — min-of-trials
    # absorbs it and the 2x adaptive extension already re-sampled it;
    # the mechanical flag is for sets that stay unusable
    assert trial_spread([3.0, 2.9, 8.4]) < CONTAMINATION_SPREAD


def test_resolve_contamination_policy():
    tainted = [2.9, 11.1, 30.6, 2.5, 2.0, 2.0]
    # clean re-run REPLACES the tainted set (no contention in minima)
    final, bad = resolve_contamination(tainted, [2.1, 2.0, 2.2])
    assert final == [2.1, 2.0, 2.2] and not bad
    # still-noisy re-run: keep all evidence, flag the query
    final, bad = resolve_contamination(tainted, [2.0, 9.0, 2.1])
    assert final == tainted + [2.0, 9.0, 2.1] and bad


def test_tiers_cover_bench_queries_exactly():
    """Same invariant main() asserts, pinned at test time too: every
    bench query is in exactly one tier."""
    all_names = [n for names in TIERS.values() for n in names]
    assert len(all_names) == len(set(all_names))
    assert set(all_names) == set(bench_queries(None, {}, None))


def test_bench_compare_normalizes_and_triages(tmp_path):
    """r16 (VERDICT r15 item 5): tools/bench_compare reads the
    driver's wrapped-and-possibly-truncated artifacts and triages
    creep with the per-tier canary in BOTH directions — raw creep
    with a matching canary rise is 'ambient', and a clean raw ratio
    hiding a normalized regression (old run recorded under load) is
    'REAL'."""
    import json

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from bench_compare import compare, load_bench

    old_inner = {
        "queries": {"q1_pricing_summary": 1.0},
        "trials": {
            "q1_pricing_summary": [1.2, 1.0],   # relational tier
            "event_window_agg": [2.0],          # events tier
            "text_quality": [1.0],              # text tier
        },
        "extra": {
            "canary_relational": 0.5,
            "canary_events": 1.0,
            "canary_text": 2.0,   # old run was ~3x loaded on text
        },
    }
    new_inner = {
        "trials": {
            "q1_pricing_summary": [2.1, 2.0],   # raw 2.0x, canary 2x -> ambient
            "event_window_agg": [2.1],          # raw 1.05x flat -> ok
            "text_quality": [1.1],              # raw 1.1x BUT canary 0.35x
        },
        "extra": {
            "canary_relational": 1.0,
            "canary_events": 1.0,
            "canary_text": 0.7,   # new run idle: normalized 3.14x -> REAL
        },
    }
    old_p, new_p = str(tmp_path / "old.json"), str(tmp_path / "new.json")
    # the driver wrapper: inner json under 'tail', FRONT-TRUNCATED
    tail = json.dumps(old_inner)
    with open(old_p, "w") as f:
        json.dump({"n": 15, "rc": 0, "tail": tail[tail.index('"trials"') - 1:],
                   "parsed": None}, f)
    with open(new_p, "w") as f:
        json.dump({"n": 16, "rc": 0, "tail": json.dumps(new_inner),
                   "parsed": None}, f)

    assert load_bench(old_p)["extra"]["canary_text"] == 2.0  # truncation ok

    rep = compare(old_p, new_p, threshold=1.2)
    rows = {r["entry"]: r for r in rep["rows"]}
    assert rows["q1_pricing_summary"]["verdict"] == "ambient"
    assert rows["event_window_agg"]["verdict"] == "ok"
    # raw clean + normalized over, but the canary swung 0.35x — the
    # entry-scales-like-the-canary assumption is broken, so this is
    # 'check' (surface + A/B), not an asserted regression
    assert rows["text_quality"]["verdict"] == "check"
    assert rep["check"] == ["text_quality"]
    assert rep["over_threshold_real"] == []
    assert rep["over_threshold_ambient"] == ["q1_pricing_summary"]

    # with a STEADY canary the masked regression IS asserted: same
    # shapes, canary flat, entry 1.5x slower under threshold-hiding
    # load in neither direction
    old2 = {
        "trials": {"text_quality": [1.0]},
        "extra": {"canary_text": 1.0},
    }
    new2 = {
        "trials": {"text_quality": [1.5]},
        "extra": {"canary_text": 1.05},
    }
    o2, n2 = str(tmp_path / "o2.json"), str(tmp_path / "n2.json")
    with open(o2, "w") as f:
        json.dump(old2, f)
    with open(n2, "w") as f:
        json.dump(new2, f)
    rep2 = compare(o2, n2, threshold=1.2)
    assert rep2["rows"][0]["verdict"] == "REAL"
    assert rep2["over_threshold_real"] == ["text_quality"]
