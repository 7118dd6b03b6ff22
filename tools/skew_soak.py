"""10x skew soak of the dedup composition (VERDICT r6 item 7).

The r6 skew harness (tests/test_skew_stress.py) proves the hot-key
guards at 5k docs; this soak proves them at a scale where a missed
guard would actually hurt: ~100k docs of which a PLANTED 50k-member
near-dup family is one giant hot component (50% of the corpus share
nearly all shingles, so they collide in nearly every LSH band).

Pipeline under test: minhash_lsh_candidates (blocked pair-gen,
max_bucket_size star-collapse) -> connected_components (large-star/
small-star). Pass criteria:
  * the planted family resolves to ONE cluster (no guard drops edges
    needed for connectivity);
  * organic 10-copy families resolve to 10-member clusters;
  * per-task input stays bounded: no task reads more than a small
    multiple of (corpus / shuffle partitions) shuffle records even
    though one logical key owns 50% of the corpus.

Metrics come from the Spark UI REST API (per-stage task summaries at
quantiles 0.5/0.95/1.0), so "peak task" is the real executor-observed
maximum, not an inference. Results are recorded in PLANS.md ("r7 10x
skew soak") — this is a measurement harness, not a CI test (wall time
is minutes).

Usage: python tools/skew_soak.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataprocessingframework_spark import queries as q  # noqa: E402
from dataprocessingframework_spark.operators import dedup  # noqa: E402
from dataprocessingframework_spark.session import get_spark  # noqa: E402

FAMILY = 50_000
COPIES = 10


def build_corpus(spark, sf_dir):
    """~100k docs: 10 id-remapped copies of the sf corpus (each doc's
    copies form an organic 10-member exact-dup family) + a planted
    FAMILY-member near-dup family (shared 120-word base text, one
    unique trailing token per member -> pairwise Jaccard ~0.99)."""
    base = q.T(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()
    copies = base.select(
        F.explode(
            F.array(*[F.lit(i) for i in range(COPIES)])
        ).alias("copy"),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * COPIES + F.col("copy")).alias("doc_id"),
        "text",
    )
    # planted family ids sit far above the organic range
    fam_base_id = (n_base + 1) * COPIES + 1_000_000
    base_words = " ".join(f"famword{i}" for i in range(120))
    family = spark.range(FAMILY).select(
        (F.col("id") + fam_base_id).alias("doc_id"),
        F.concat(
            F.lit(base_words + " unique"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    return copies.unionByName(family), fam_base_id, n_base


def stage_peaks(ui_base: str) -> list[dict]:
    """Pull per-stage max-task metrics from the Spark UI REST API."""
    apps = json.load(
        urllib.request.urlopen(f"{ui_base}/api/v1/applications")
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui_base}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    out = []
    for st in stages:
        out.append(
            {
                "stage": st["stageId"],
                "name": st["name"].split("\n")[0][:60],
                "tasks": st["numCompleteTasks"],
                "input_mb": round(st.get("inputBytes", 0) / 1e6, 1),
                "shuffle_read_mb": round(
                    st.get("shuffleReadBytes", 0) / 1e6, 1
                ),
                "shuffle_read_rec": st.get("shuffleReadRecords", 0),
                "shuffle_write_mb": round(
                    st.get("shuffleWriteBytes", 0) / 1e6, 1
                ),
            }
        )
    return out


def task_peak(ui_base: str, stage_id: int) -> dict:
    apps = json.load(
        urllib.request.urlopen(f"{ui_base}/api/v1/applications")
    )
    app_id = apps[0]["id"]
    url = (
        f"{ui_base}/api/v1/applications/{app_id}/stages/{stage_id}/0/"
        "taskSummary?quantiles=0.5,0.95,1.0"
    )
    try:
        s = json.load(urllib.request.urlopen(url))
    except Exception:
        return {}
    sr = s.get("shuffleReadMetrics", {})
    return {
        "task_ms_p50_p95_max": s.get("executorRunTime"),
        "shuffle_read_rec_p50_p95_max": sr.get("readRecords"),
        "shuffle_read_mb_p50_p95_max": [
            round(b / 1e6, 2) for b in sr.get("readBytes", [])
        ]
        or None,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="dpf-skew-soak",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4040"

    docs, fam_base_id, n_base = build_corpus(spark, sf_dir)
    docs = docs.localCheckpoint()  # corpus built once, lineage cut
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs ({FAMILY} planted family)", flush=True)

    t0 = time.time()
    pairs = dedup.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=16, bands=4
    ).localCheckpoint()
    n_pairs = pairs.count()
    t_lsh = time.time() - t0
    print(f"lsh candidates: {n_pairs} pairs in {t_lsh:.1f}s", flush=True)

    t0 = time.time()
    labels = dedup.connected_components(
        pairs, all_nodes=docs.select("doc_id")
    ).localCheckpoint()
    n_nodes = labels.count()
    t_cc = time.time() - t0
    print(f"cc: {n_nodes} labeled in {t_cc:.1f}s", flush=True)

    # correctness of the SOAK itself
    fam = labels.filter(F.col("node") >= fam_base_id)
    fam_clusters = fam.select("cluster").distinct().count()
    fam_members = fam.count()
    sizes = (
        labels.groupBy("cluster")
        .count()
        .groupBy("count")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy(F.desc("count"))
        .limit(5)
        .collect()
    )
    print(
        f"planted family: {fam_members} members in {fam_clusters} cluster(s)"
    )
    print("largest cluster sizes:", [(r["count"], r["n_clusters"]) for r in sizes])
    assert fam_clusters == 1, "planted family fractured"
    assert fam_members == FAMILY

    # peak-task evidence
    stages = stage_peaks(ui)
    heavy = sorted(
        stages, key=lambda s: -s["shuffle_read_rec"]
    )[:6]
    print("\nheaviest stages by shuffle-read records:")
    for st in heavy:
        peak = task_peak(ui, st["stage"])
        print(json.dumps({**st, **peak}))

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_pairs": n_pairs,
                "t_lsh_sec": round(t_lsh, 1),
                "t_cc_sec": round(t_cc, 1),
                "family_members": fam_members,
                "family_clusters": fam_clusters,
            }
        )
    )


if __name__ == "__main__":
    main()
