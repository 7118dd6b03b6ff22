"""Compare two recorded BENCH_r{N}.json artifacts, raw AND
canary-normalized (r16 — VERDICT r15 item 5).

Ambient machine load inflates same-code bench entries ±10-30% (and
worse: the r15 driver run recorded 2.26 s on the text tier's canary
vs 0.63-0.79 s elsewhere — ~3x load during exactly that tier). The
per-tier canary (bench.py, r14) measures that load in-artifact; this
tool divides it OUT so round-over-round creep can be read off the
artifacts with zero hand-run A/Bs:

    normalized_ratio(entry) = (new_min / old_min)
                            / (new_canary_tier / old_canary_tier)

Entries whose raw ratio exceeds the threshold but whose normalized
ratio does not are reported as AMBIENT (machine), the rest of the
exceeders as REAL (code) — the triage the wrap note needs.

Handles the driver's recording format: the artifact may wrap the
bench JSON under ``parsed`` (dict) or ``tail`` (string, possibly
TRUNCATED at the front) — ``trials``/``extra`` blocks are recovered
from the tail by balanced-brace extraction.

Usage:
    python tools/bench_compare.py BENCH_r15.json BENCH_r16.json \
        [--threshold 1.2] [--json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _balanced_block(text: str, key: str) -> dict | None:
    """Extract the JSON object following ``"key": `` from ``text`` by
    brace counting (the front of ``text`` may be cut off)."""
    marker = f'"{key}": {{'
    i = text.find(marker)
    if i < 0:
        return None
    start = i + len(marker) - 1
    depth = 0
    in_str = False
    esc = False
    for j in range(start, len(text)):
        c = text[j]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                try:
                    return json.loads(text[start : j + 1])
                except json.JSONDecodeError:
                    return None
    return None


def load_bench(path: str) -> dict:
    """-> {"trials": {name: [sec,...]}, "extra": {...}} from either a
    raw bench line or the driver's recorded wrapper."""
    with open(path) as f:
        raw = f.read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = {"tail": raw}
    if isinstance(doc, dict) and ("trials" in doc or "queries" in doc):
        inner = doc
    elif isinstance(doc.get("parsed"), dict):
        inner = doc["parsed"]
    else:
        tail = doc.get("tail", "")
        inner = {
            "trials": _balanced_block(tail, "trials"),
            "extra": _balanced_block(tail, "extra"),
            "queries": _balanced_block(tail, "queries"),
        }
    trials = inner.get("trials") or {}
    queries = inner.get("queries") or {}
    if not trials and queries:
        # oldest artifacts carry only the min — treat as 1 trial
        trials = {k: [v] for k, v in queries.items()}
    return {"trials": trials, "extra": inner.get("extra") or {}}


def tier_of() -> dict[str, str]:
    from bench import TIERS

    return {q: t for t, qs in TIERS.items() for q in qs}


def _verdict(
    ratio: float,
    norm: float | None,
    canary_ratio: float | None,
    threshold: float,
) -> str:
    """Triage one entry. The NORMALIZED ratio is the code signal
    whenever a canary pair exists — in both directions: a raw creep
    whose normalized ratio is clean reads as machine load, and a
    clean raw ratio whose normalized ratio exceeds reads as a
    regression masked by a lighter-loaded new run. BUT normalization
    assumes the entry scales with load like the canary does, which
    breaks down when the ambient shift itself is large (observed on
    the r15->r16 artifacts: the r15 text canary ran ~3x loaded, and
    idle-r16 entries with raw ratios of 0.6-0.8 normalized to 2.0+
    on untouched code). So SYMMETRICALLY: any verdict that rests on
    the normalized ratio alone — excusing a raw creep as 'ambient'
    OR asserting a masked regression as 'REAL' — requires a modest
    canary swing; under a large swing it downgrades to 'check'
    (surface it, A/B it, don't assert either way). Exceedance in
    both raw AND normalized is 'REAL' regardless."""
    if norm is None:
        return "REAL" if ratio > threshold else "ok"
    steady = canary_ratio is not None and 0.75 <= canary_ratio <= 1.33
    if norm <= threshold:
        if ratio <= threshold:
            return "ok"
        return "ambient" if steady else "check"
    if ratio > threshold:
        return "REAL"
    return "REAL" if steady else "check"


def compare(old_path: str, new_path: str, threshold: float) -> dict:
    old, new = load_bench(old_path), load_bench(new_path)
    tiers = tier_of()
    shared = sorted(set(old["trials"]) & set(new["trials"]))
    rows = []
    for name in shared:
        o = min(old["trials"][name])
        n = min(new["trials"][name])
        ratio = n / o if o else float("inf")
        tier = tiers.get(name)
        ck = f"canary_{tier}" if tier else None
        co = old["extra"].get(ck)
        cn = new["extra"].get(ck)
        # one derivation, consumed by the row field, the normalized
        # ratio, AND the verdict — keeps the three in sync
        cr = (cn / co) if co and cn else None
        norm = ratio / cr if cr else None
        rows.append(
            {
                "entry": name,
                "tier": tier,
                "old_min": o,
                "new_min": n,
                "ratio": round(ratio, 3),
                "canary_ratio": round(cr, 3) if cr else None,
                "normalized": round(norm, 3) if norm is not None else None,
                "verdict": _verdict(ratio, norm, cr, threshold),
            }
        )
    rows.sort(key=lambda r: -(r["normalized"] or r["ratio"]))

    def geomean(vals):
        vals = [v for v in vals if v and v > 0]
        return (
            round(math.exp(sum(math.log(v) for v in vals) / len(vals)), 3)
            if vals
            else None
        )

    return {
        "old": os.path.basename(old_path),
        "new": os.path.basename(new_path),
        "entries": len(rows),
        "geomean_raw": geomean([r["ratio"] for r in rows]),
        "geomean_normalized": geomean(
            [r["normalized"] for r in rows if r["normalized"]]
        ),
        "over_threshold_real": [
            r["entry"] for r in rows if r["verdict"] == "REAL"
        ],
        "over_threshold_ambient": [
            r["entry"] for r in rows if r["verdict"] == "ambient"
        ],
        "check": [r["entry"] for r in rows if r["verdict"] == "check"],
        "rows": rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.2)
    ap.add_argument(
        "--json", action="store_true", help="machine-readable output"
    )
    args = ap.parse_args()
    rep = compare(args.old, args.new, args.threshold)
    if args.json:
        print(json.dumps(rep))
        return
    print(
        f"{rep['old']} -> {rep['new']}  ({rep['entries']} shared entries)"
    )
    print(
        f"geomean raw {rep['geomean_raw']}  "
        f"normalized {rep['geomean_normalized']}"
    )
    hdr = f"{'entry':34} {'tier':10} {'old':>7} {'new':>7} {'ratio':>6} {'canary':>7} {'norm':>6}  verdict"
    print(hdr)
    for r in rep["rows"]:
        print(
            f"{r['entry']:34} {str(r['tier']):10} {r['old_min']:7.3f}"
            f" {r['new_min']:7.3f} {r['ratio']:6.2f}"
            f" {str(r['canary_ratio']):>7} {str(r['normalized']):>6}"
            f"  {r['verdict']}"
        )


if __name__ == "__main__":
    main()
