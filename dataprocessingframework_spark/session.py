"""SparkSession bootstrap tuned for this engine.

Defaults are chosen for correctness-first local runs but with the knobs
that matter at cluster scale: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), explicit shuffle partition count,
Arrow enabled for every pandas interchange, UTC session time.

At 100 TB on a 1000-executor cluster the same settings hold; only
``spark.sql.shuffle.partitions`` (or AQE's advisory size) and
``spark.sql.files.maxPartitionBytes`` need re-sizing, and both are
exposed here as parameters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Two Catalyst planning methods (DataSourceV2Strategy::apply 10,221 B,
# ResolveSessionCatalog 10,058 B) exceed HotSpot's 8000-bytecode
# DontCompileHugeMethods ceiling and run INTERPRETED by default; AQE
# re-plans per stage, so plan-heavy drivers pay a randomly-appearing
# 10-60x planning slowdown (root-caused r16, OPTIMIZATION_r16.md
# "spans bimodality"). Scale-independent: a 100 TB driver plans the
# same methods.
_JIT_PLANNER_FLAG = "-XX:-DontCompileHugeMethods"


def merge_driver_java_options(caller_value: str) -> str:
    """Merge a caller's ``spark.driver.extraJavaOptions`` with the
    interpreted-planner fix: prepend :data:`_JIT_PLANNER_FLAG` so the
    caller's flags still win any conflict (last flag wins in HotSpot)
    but the fix is not silently dropped at an override site. If the
    caller already passes the flag (either polarity), their value is
    returned untouched — no duplicate on the command line (ADVICE r16;
    an explicit ``-XX:+DontCompileHugeMethods`` is a deliberate caller
    choice and prepending ours would be a no-op anyway). Executor-side
    planning (DSv2 connectors) is not covered — set executor opts on a
    real cluster if executors ever plan."""
    if "DontCompileHugeMethods" in caller_value:
        return caller_value.strip()
    return f"{_JIT_PLANNER_FLAG} {caller_value}".strip()


def get_spark(
    app_name: str = "dataprocessingframework-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    max_partition_bytes: str = "128m",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Scale notes: AQE coalesces small shuffle partitions and splits skewed
    ones at runtime, so ``shuffle_partitions`` only needs to be an upper
    bound of the useful parallelism (2-3x total cores on a real cluster).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # local mode: the driver JVM is the whole cluster — size it like one
        # (must be set before the JVM starts; no-op on an existing session)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.driver.maxResultSize", "4g")
        # interpreted-planner fix (r16) — see merge_driver_java_options
        .config("spark.driver.extraJavaOptions", _JIT_PLANNER_FLAG)
        # --- adaptive execution: runtime re-plan, skew splitting, coalescing
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle & scan sizing
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.files.maxPartitionBytes", max_partition_bytes)
        # --- Arrow for every pandas interchange (UDFs, toPandas)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- determinism & ANSI-ish behavior for oracle parity
        .config("spark.sql.session.timeZone", "UTC")
        # broadcast small dims automatically; AQE converts at runtime too
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    for k, v in (extra_conf or {}).items():
        if k == "spark.driver.extraJavaOptions":
            v = merge_driver_java_options(v)
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
