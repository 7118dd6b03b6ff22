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
