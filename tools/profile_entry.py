"""Profile one bench entry: run it warm, then dump per-stage metrics
(executor run time, shuffle read/write, input bytes, task count) from
the Spark UI REST API — the guide §1.1 empirical loop without a
browser.

Usage: python tools/profile_entry.py <entry> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    entry = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import bench
    from dataprocessingframework_spark.session import get_spark

    conf = json.loads(os.environ.get("SPARK_GRAFT_PROFILE_CONF", "{}"))
    spark = get_spark(app_name=f"profile-{entry}", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    from dataprocessingframework_spark import queries as q

    q.T(spark, SF_DIR, "lineitem").count()

    extra: dict = {}
    thunks = bench.bench_queries(spark, extra, {entry})
    thunk = thunks[entry]

    thunk()  # warm-up (untimed)
    base_url = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
            f"{base_url}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.loads(r.read())

    before_ids = {s["stageId"] for s in stages()}
    t0 = time.time()
    for _ in range(runs):
        thunk()
    wall = time.time() - t0
    after = [s for s in stages() if s["stageId"] not in before_ids]
    after.sort(key=lambda s: -s.get("executorRunTime", 0))
    total_run = sum(s.get("executorRunTime", 0) for s in after)
    print(f"\nwall {wall:.2f}s over {runs} run(s); "
          f"{len(after)} stages, executorRunTime total {total_run/1000:.1f}s")
    print(f"{'stage':>6} {'runTime_s':>9} {'tasks':>5} {'input_MB':>8} "
          f"{'shRead_MB':>9} {'shWrite_MB':>10}  name")
    for s in after[:30]:
        print(
            f"{s['stageId']:>6} {s.get('executorRunTime', 0)/1000:>9.2f} "
            f"{s.get('numCompleteTasks', 0):>5} "
            f"{s.get('inputBytes', 0)/1e6:>8.1f} "
            f"{s.get('shuffleReadBytes', 0)/1e6:>9.2f} "
            f"{s.get('shuffleWriteBytes', 0)/1e6:>10.2f}  "
            f"{s.get('name', '')[:70]}"
        )
    cleanup = extra.pop("_cleanup", None)
    if cleanup is not None:
        cleanup()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
