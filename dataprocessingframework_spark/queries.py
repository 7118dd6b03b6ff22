"""Declared-query registry: every operator from SURVEY.md §2 with a
Spark implementation and (where SQL-expressible) a DuckDB oracle.

Each entry is ``(spark_fn, oracle_sql | None)``; ``spark_fn`` takes
``(spark, sf_dir)`` and returns a DataFrame whose column names match the
oracle's aliases exactly (the driver's comparator hashes values after
sorting columns by name).

Conventions for oracle parity (FIXTURES.md §3):
- explicit ORDER BY on a unique key, or aggregate reduction;
- floats ROUND()ed in both engines (identical expression trees over
  doubles produce bit-identical values, so rounding is stable);
- counts/sizes cast to BIGINT on both sides (Spark size()/row_number()
  are 32-bit, DuckDB COUNT is 64-bit — align explicitly);
- DuckDB regexp_replace needs the 'g' flag to match Spark's
  replace-all; DuckDB date_trunc returns DATE, so use CAST(ts AS DATE)
  against Spark's to_date.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from dataprocessingframework_spark.dataset import Dataset
from dataprocessingframework_spark.functions.hashing import (
    MINHASH_PRIME,
    minhash_coeffs,
)
from dataprocessingframework_spark.operators import (
    dedup,
    similarity,
    text_analysis,
    validators,
)

SparkQuery = Callable[[SparkSession, str], DataFrame]

P = MINHASH_PRIME

_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    The external driver imports ``__spark_entry__`` by path from an
    arbitrary cwd; cloudpickle serializes mapInPandas / pandas-UDF
    closures by *reference* to this package, so Python workers must be
    able to import it — a driver-side ``sys.path`` entry does not
    propagate. Shipping a zip via ``addPyFile`` fixes that identically
    in local and cluster mode (workers prepend shipped files to their
    ``sys.path``)."""
    import os
    import shutil
    import tempfile

    sc = spark.sparkContext
    app_id = sc.applicationId  # unique per context, unlike id(sc)
    if app_id in _SHIPPED:
        return
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    target = os.path.join(
        tempfile.gettempdir(), f"dpf_spark_pkg_{os.getpid()}"
    )
    zpath = shutil.make_archive(
        target, "zip", root_dir=root, base_dir="dataprocessingframework_spark"
    )
    sc.addPyFile(zpath)
    _SHIPPED.add(app_id)


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ship_package(spark)
    if name == "events":
        # events.parquet has shipped as either TIMESTAMP(NANOS) — which the
        # Spark parquet reader rejects unless read as long — or plain
        # timestamp[us]. Enable nanosAsLong (a no-op for micros files) and
        # convert only when the column actually arrives as a long: integer
        # division, because a double division would lose precision on
        # epoch-nanos ~1.7e18 > 2^53.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # Watermarks/event-time require TimestampType; the cast keeps
            # the wall-clock value (session tz interprets it, UTC here).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def D(spark: SparkSession, sf_dir: str, name: str) -> Dataset:
    return Dataset(T(spark, sf_dir, name))


# --------------------------------------------------------------------------
# §2.1 scans
# --------------------------------------------------------------------------


def q_s1_files_scan(spark, sf_dir):
    """S1: full metadata-table scan (`dataset_reader.py:256-295`)."""
    return D(spark, sf_dir, "lineitem").df


SQL_S1 = "SELECT * FROM lineitem"


def q_s2_provenance(spark, sf_dir):
    """S2: multi-shard scan provenance column (`dataset_reader.py:125-130`)."""
    return (
        D(spark, sf_dir, "documents")
        .group_by("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("source")
    )


SQL_S2 = "SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source ORDER BY source"


def q_s4_inmemory(spark, sf_dir):
    """S4: in-memory source (`dataset_reader.py:327-356`)."""
    return spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], schema="a int, b string"
    )


SQL_S4 = "SELECT * FROM (VALUES (1,'x'),(2,'y'),(3,'z')) AS t(a, b) ORDER BY a"


# --------------------------------------------------------------------------
# §2.3 projection / filter
# --------------------------------------------------------------------------


def q_p1_filter(spark, sf_dir):
    """P1 filter_df (`processors/processor.py:322-333`)."""
    ds = D(spark, sf_dir, "lineitem").filter(
        (F.col("l_discount").between(0.05, 0.07)) & (F.col("l_quantity") < 24)
    )
    return ds.agg(F.count(F.lit(1)).alias("cnt")).df


SQL_P1 = (
    "SELECT COUNT(*) AS cnt FROM lineitem "
    "WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
)


def q_p2_df_filter(spark, sf_dir):
    """P2 add_dataframe_filter stage (`pipelines/pipeline_stages.py:37-47`)."""
    ds = D(spark, sf_dir, "events").transform(
        lambda df: df.filter(F.col("event_type") == "click")
    )
    return ds.agg(F.count(F.lit(1)).alias("cnt")).df


SQL_P2 = "SELECT COUNT(*) AS cnt FROM events WHERE event_type = 'click'"


def q_p3_projection(spark, sf_dir):
    """P3 column pruning (`dataloaders/files_dataset.py:63-67`)."""
    return (
        D(spark, sf_dir, "lineitem")
        .order_by("l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_quantity")
        .df
    )


SQL_P3 = (
    "SELECT l_orderkey, l_quantity FROM lineitem "
    "ORDER BY l_orderkey, l_linenumber LIMIT 100"
)


def q_p4_column_expr(spark, sf_dir):
    """P4 column set (`processors/processor.py:60-64`)."""
    return (
        D(spark, sf_dir, "orders")
        .with_column("total_bumped", F.round(F.col("o_totalprice") * 1.1, 2))
        .order_by("o_orderkey")
        .limit(100)
        .select("o_orderkey", "total_bumped")
        .df
    )


SQL_P4 = (
    "SELECT o_orderkey, ROUND(o_totalprice * 1.1, 2) AS total_bumped "
    "FROM orders ORDER BY o_orderkey LIMIT 100"
)


def q_p6_notnull(spark, sf_dir):
    """P6 failed-sample drop (`filters/data_filter.py:138-141`)."""
    ds = D(spark, sf_dir, "events").drop_null(["value"])
    return ds.agg(F.count(F.lit(1)).alias("cnt")).df


SQL_P6 = "SELECT COUNT(*) AS cnt FROM events WHERE value IS NOT NULL"


# --------------------------------------------------------------------------
# §2.4 joins
# --------------------------------------------------------------------------


def q_j1_filter_merge(spark, sf_dir):
    """J1 filter-result left merge (`processors/processor.py:197`):
    small keyed result side -> broadcast hash join, no big-side shuffle."""
    orders = D(spark, sf_dir, "orders")
    result = (
        orders.group_by("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumnRenamed("o_custkey", "k")
    )
    return (
        orders.join(result, on=F.col("o_custkey") == F.col("k"), how="left",
                    broadcast_other=True)
        .order_by("o_orderkey")
        .limit(100)
        .select("o_orderkey", "cnt")
        .df
    )


SQL_J1 = (
    "SELECT o.o_orderkey, n.cnt FROM orders o LEFT JOIN "
    "(SELECT o_custkey AS k, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) n "
    "ON o.o_custkey = n.k ORDER BY o.o_orderkey LIMIT 100"
)


def q_j3_inner(spark, sf_dir):
    """J3 update_columns inner merge (`files_processor.py:82`)."""
    c = D(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, on=F.col("c_custkey") == F.col("o_custkey"), how="inner")
        .order_by("o_orderkey")
        .limit(100)
        .select("c_name", "o_orderkey")
        .df
    )


SQL_J3 = (
    "SELECT c.c_name, o.o_orderkey FROM customer c JOIN orders o "
    "ON c.c_custkey = o.o_custkey ORDER BY o.o_orderkey LIMIT 100"
)


def q_j_semi(spark, sf_dir):
    """Semi join (surface absent in reference, free in Spark)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    out = c.join(
        o, on=c["c_custkey"] == o["o_custkey"], how="left_semi"
    )
    return out.agg(F.count(F.lit(1)).alias("cnt"))


SQL_J_SEMI = (
    "SELECT COUNT(*) AS cnt FROM customer c WHERE EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
)


def q_j_anti(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    out = c.join(o, on=c["c_custkey"] == o["o_custkey"], how="left_anti")
    return out.agg(F.count(F.lit(1)).alias("cnt"))


SQL_J_ANTI = (
    "SELECT COUNT(*) AS cnt FROM customer c WHERE NOT EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
)


# --------------------------------------------------------------------------
# §2.5 aggregation
# --------------------------------------------------------------------------


def q_a1_summary(spark, sf_dir):
    """A1 summary stats (`processors/processor.py:66-99`)."""
    return D(spark, sf_dir, "lineitem").agg(
        F.count("l_quantity").alias("cnt_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    ).df


SQL_A1 = (
    "SELECT COUNT(l_quantity) AS cnt_qty, ROUND(AVG(l_quantity),4) AS avg_qty, "
    "MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty, "
    "ROUND(SUM(l_extendedprice),2) AS sum_price FROM lineitem"
)


def q_a3_group_agg(spark, sf_dir):
    """A3 group-by aggregate (`dataloaders/shards_dataset.py:74-77`)."""
    return (
        D(spark, sf_dir, "orders")
        .group_by("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


SQL_A3 = (
    "SELECT o_orderstatus, COUNT(*) AS cnt, ROUND(SUM(o_totalprice),2) AS total "
    "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
)


def q_a4_count_distinct(spark, sf_dir):
    """A4 distinct values (`processors/shards_processor.py:63-65`)."""
    return D(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("cnt")
    ).df


SQL_A4 = "SELECT COUNT(DISTINCT l_partkey) AS cnt FROM lineitem"


def q_a5_dup_detect(spark, sf_dir):
    """A5 duplicate detection (`sharded_validator.py:42-44`)."""
    return (
        D(spark, sf_dir, "documents")
        .duplicates(["n_chars"])
        .withColumnRenamed("dup_count", "c")
        .orderBy("n_chars")
    )


SQL_A5 = (
    "SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY n_chars "
    "HAVING COUNT(*) > 1 ORDER BY n_chars"
)


def q_a_rollup(spark, sf_dir):
    """Rollup (absent in reference; free via df.rollup)."""
    return (
        T(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


SQL_A_ROLLUP = (
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders "
    "GROUP BY ROLLUP(o_orderstatus, o_orderpriority) "
    "ORDER BY o_orderstatus, o_orderpriority"
)


# --------------------------------------------------------------------------
# §2.6 dedup / set ops / sort / limit
# --------------------------------------------------------------------------


def q_d1_distinct(spark, sf_dir):
    """D1 dedup, cardinality (`pipelines/pipeline_stages.py:50-60`)."""
    ds = D(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").drop_duplicates()
    return ds.agg(F.count(F.lit(1)).alias("cnt")).df


SQL_D1 = (
    "SELECT COUNT(*) AS cnt FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)"
)


def q_d1_keep_first(spark, sf_dir):
    """D1 deterministic keep-first dedup via window (pandas keep='first')."""
    return (
        D(spark, sf_dir, "documents")
        .drop_duplicates_keep_first(["lang"], "doc_id")
        .select("lang", "doc_id")
        .order_by("lang")
        .df
    )


SQL_D1_KEEP_FIRST = (
    "SELECT lang, MIN(doc_id) AS doc_id FROM documents GROUP BY lang ORDER BY lang"
)


def q_d2_shuffle(spark, sf_dir):
    """D2 seeded shuffle (`pipeline_stages.py:27-34`): content-stable."""
    return D(spark, sf_dir, "region").shuffle(seed=42).df


SQL_D2 = "SELECT * FROM region"


def q_d4_union(spark, sf_dir):
    """D4 union (`dataset_reader.py:126-130`)."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return Dataset(c).union(s).agg(F.count(F.lit(1)).alias("cnt")).df


SQL_D4 = (
    "SELECT COUNT(*) AS cnt FROM (SELECT c_nationkey AS k FROM customer "
    "UNION ALL SELECT s_nationkey FROM supplier)"
)


def q_d5_topk(spark, sf_dir):
    """D5 sort + top-k (`filters/multigpu_filter.py:132`)."""
    return (
        D(spark, sf_dir, "part")
        .order_by(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(20)
        .select("p_partkey", "p_name", "p_retailprice")
        .df
    )


SQL_D5 = (
    "SELECT p_partkey, p_name, p_retailprice FROM part "
    "ORDER BY p_retailprice DESC, p_partkey LIMIT 20"
)


def q_d7_limit_offset(spark, sf_dir):
    """D7 range slice (`scripts/multi_gpu_filter.py:36-42`)."""
    return (
        D(spark, sf_dir, "nation")
        .order_by("n_nationkey")
        .offset(5)
        .limit(10)
        .select("n_nationkey", "n_name")
        .df
    )


SQL_D7 = "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 10 OFFSET 5"


def q_set_intersect(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


SQL_INTERSECT = (
    "SELECT * FROM (SELECT c_nationkey AS k FROM customer INTERSECT "
    "SELECT s_nationkey AS k FROM supplier) ORDER BY k"
)


def q_set_except(spark, sf_dir):
    n = T(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return n.exceptAll(s.distinct()).distinct().orderBy("k")


SQL_EXCEPT = (
    "SELECT * FROM (SELECT n_nationkey AS k FROM nation EXCEPT "
    "SELECT s_nationkey AS k FROM supplier) ORDER BY k"
)


def q_set_except_nonempty(spark, sf_dir):
    """EXCEPT ALL on a GUARANTEED-non-empty, duplicate-sensitive case
    (customers outnumber suppliers ~15:1 per nation, so the multiset
    difference keeps most customer rows): set_except's oracle row
    matches on 0 rows, which is weak evidence for EXCEPT semantics —
    this variant makes the per-key surviving multiplicities the
    checked value."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return (
        c.exceptAll(s)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("k")
    )


SQL_EXCEPT_NONEMPTY = (
    "SELECT k, COUNT(*) AS cnt FROM (SELECT c_nationkey AS k FROM customer "
    "EXCEPT ALL SELECT s_nationkey AS k FROM supplier) GROUP BY k ORDER BY k"
)


def q_window_topn(spark, sf_dir):
    """Window ranking (absent in reference; declared §2.6)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        T(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
        .limit(100)
        .select("o_custkey", "o_orderkey", "rn")
    )


SQL_WINDOW_TOPN = (
    "SELECT o_custkey, o_orderkey, rn FROM (SELECT o_custkey, o_orderkey, "
    "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn "
    "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 100"
)


def q_window_running(spark, sf_dir):
    """Analytic window frame: per-customer running total."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        T(spark, sf_dir, "orders")
        .withColumn("run_total", F.round(F.sum("o_totalprice").over(w), 2))
        .orderBy("o_custkey", "o_orderkey")
        .limit(200)
        .select("o_custkey", "o_orderkey", "run_total")
    )


SQL_WINDOW_RUNNING = (
    "SELECT o_custkey, o_orderkey, ROUND(SUM(o_totalprice) OVER ("
    "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total "
    "FROM orders ORDER BY o_custkey, o_orderkey LIMIT 200"
)


# --------------------------------------------------------------------------
# §2.7 scalar functions
# --------------------------------------------------------------------------


def q_f1_basename(spark, sf_dir):
    from dataprocessingframework_spark.functions.paths import basename

    return (
        T(spark, sf_dir, "documents")
        .select(basename("source").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("b")
    )


SQL_F1 = (
    "SELECT string_split(source,'/')[-1] AS b, COUNT(*) AS cnt "
    "FROM documents GROUP BY b ORDER BY b"
)


def q_f2_substring(spark, sf_dir):
    from dataprocessingframework_spark.functions.paths import strip_prefix

    return (
        T(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .limit(50)
        .select("o_orderkey", strip_prefix("o_orderpriority", 2).alias("pri"))
    )


SQL_F2 = (
    "SELECT o_orderkey, substring(o_orderpriority, 3) AS pri FROM orders "
    "ORDER BY o_orderkey LIMIT 50"
)


def q_f3_concat(spark, sf_dir):
    return (
        T(spark, sf_dir, "region")
        .select(
            F.concat(F.col("r_name"), F.lit("-"), F.col("r_regionkey").cast("string")).alias("rid"),
            "r_regionkey",
        )
        .orderBy("r_regionkey")
        .select("rid")
    )


SQL_F3 = (
    "SELECT concat(r_name, '-', CAST(r_regionkey AS VARCHAR)) AS rid "
    "FROM region ORDER BY r_regionkey"
)


def q_f4_suffix(spark, sf_dir):
    return (
        T(spark, sf_dir, "part")
        .filter(F.col("p_type").endswith("ARD"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_F4 = "SELECT COUNT(*) AS cnt FROM part WHERE p_type LIKE '%ARD'"


def q_f5_regex_clean(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(50)
        .select(
            "doc_id",
            F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "").alias("t"),
        )
    )


SQL_F5 = (
    "SELECT doc_id, regexp_replace(lower(text), '[0-9]+', '', 'g') AS t "
    "FROM documents ORDER BY doc_id LIMIT 50"
)


def q_f6_lower_trim(spark, sf_dir):
    return (
        T(spark, sf_dir, "part")
        .orderBy("p_partkey")
        .limit(50)
        .select("p_partkey", F.lower(F.trim(F.col("p_name"))).alias("n"))
    )


SQL_F6 = (
    "SELECT p_partkey, lower(trim(p_name)) AS n FROM part ORDER BY p_partkey LIMIT 50"
)


def q_f7_arith(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                2,
            ).alias("charge"),
        )
    )


SQL_F7 = (
    "SELECT l_orderkey, l_linenumber, "
    "ROUND(l_extendedprice*(1-l_discount)*(1+l_tax), 2) AS charge "
    "FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100"
)


def q_f8_json(spark, sf_dir):
    """F8 JSON decode (`filters/images/ocr_filter.py:102`)."""
    return (
        T(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(50)
        .select("event_id", F.get_json_object("props", "$.k").alias("k"))
    )


SQL_F8 = (
    "SELECT event_id, json_extract_string(props,'$.k') AS k FROM events "
    "ORDER BY event_id LIMIT 50"
)


def q_f9_least_greatest(spark, sf_dir):
    return T(spark, sf_dir, "part").agg(
        F.max(F.greatest(F.col("p_size"), F.lit(10))).alias("mx"),
        F.min(F.least(F.col("p_size"), F.lit(10))).alias("mn"),
    )


SQL_F9 = "SELECT MAX(GREATEST(p_size,10)) AS mx, MIN(LEAST(p_size,10)) AS mn FROM part"


def q_f_date_trunc(spark, sf_dir):
    """Date functions (absent in reference; declared §2.7)."""
    return (
        T(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("d")
    )


SQL_F_DATE = (
    "SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt FROM events GROUP BY d ORDER BY d"
)


def q_f_time_bucket(spark, sf_dir):
    """Tumbling event-time window, batch parity for the streaming surface
    (§2.12): Spark F.window == DuckDB time_bucket (epoch-aligned)."""
    return (
        T(spark, sf_dir, "events")
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
        .orderBy("win_start", "event_type")
    )


SQL_F_TIME_BUCKET = (
    "SELECT time_bucket(INTERVAL '15 minutes', ts) AS win_start, event_type, "
    "COUNT(*) AS cnt, ROUND(SUM(value),2) AS sum_value "
    "FROM events GROUP BY win_start, event_type ORDER BY win_start, event_type"
)


def q_stream_tumbling(spark, sf_dir):
    """§2.12: REAL Structured Streaming run under the oracle gate —
    events replayed through readStream (availableNow trigger), the
    SAME windowed aggregation as the batch path (streaming/events.py),
    memory sink; the oracle is identical to f_time_bucket's SQL. Batch
    and stream must agree exactly."""
    import uuid

    from dataprocessingframework_spark.streaming import tumbling_window_agg

    events = T(spark, sf_dir, "events")
    stage_dir = f"/root/repo/.scratch/stream_events_{uuid.uuid4().hex[:8]}"
    qname = f"stream_win_{uuid.uuid4().hex[:8]}"
    # stage a micros-precision copy (readStream needs a fixed schema dir)
    events.write.mode("overwrite").parquet(stage_dir)
    stream = spark.readStream.schema(events.schema).parquet(stage_dir)
    agg = tumbling_window_agg(
        stream, ts_col="ts", window="15 minutes", group_cols=["event_type"]
    ).select(
        "win_start",
        "event_type",
        "cnt",
        F.round("sum_value", 2).alias("sum_value"),
    )
    import shutil

    try:
        sq = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()
        out = spark.table(qname).orderBy("win_start", "event_type").cache()
        out.count()
        return out
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)


SQL_STREAM_TUMBLING = (
    "SELECT time_bucket(INTERVAL '15 minutes', ts) AS win_start, event_type, "
    "COUNT(*) AS cnt, ROUND(SUM(value),2) AS sum_value "
    "FROM events GROUP BY win_start, event_type ORDER BY win_start, event_type"
)


def q_stream_enriched(spark, sf_dir):
    """Stream-static enrichment under the oracle gate: the events
    stream joins the static customer dim (broadcast per micro-batch,
    stateless) before a windowed agg — the standard dimension-
    enrichment topology. Real readStream run, availableNow trigger."""
    import shutil
    import uuid

    from dataprocessingframework_spark.streaming import (
        stream_static_enrich,
        tumbling_window_agg,
    )

    events = T(spark, sf_dir, "events")
    cust = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stage_dir = f"/root/repo/.scratch/stream_enrich_{uuid.uuid4().hex[:8]}"
    qname = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    events.write.mode("overwrite").parquet(stage_dir)
    stream = spark.readStream.schema(events.schema).parquet(stage_dir)
    agg = tumbling_window_agg(
        stream_static_enrich(stream, cust, ["user_id"]),
        ts_col="ts",
        window="1 hour",
        group_cols=["c_mktsegment"],
    ).select(
        "win_start",
        "c_mktsegment",
        "cnt",
        F.round("sum_value", 2).alias("sum_value"),
    )
    try:
        sq = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()
        out = spark.table(qname).orderBy("win_start", "c_mktsegment").cache()
        out.count()
        return out
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)


SQL_STREAM_ENRICHED = (
    "SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, c_mktsegment, "
    "COUNT(*) AS cnt, ROUND(SUM(value),2) AS sum_value "
    "FROM events e JOIN customer c ON e.user_id = c.c_custkey "
    "GROUP BY win_start, c_mktsegment ORDER BY win_start, c_mktsegment"
)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_a_pivot(spark, sf_dir):
    """Pivot (long->wide): daily value totals per event type as
    columns. The pivot values are passed EXPLICITLY — omitting them
    makes Spark run an eager distinct over 100 TB just to discover
    column names; with the list supplied the plan is a two-level
    aggregate — partial (day,type) sums map-side combined before the
    first exchange, then the per-day pivot rollup — plus the
    presentation sort. Observed: 2 hash exchanges + 1 range, no
    distinct pass."""
    ev = T(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum("value"), 2))
        .orderBy("day")
    )
    return out


SQL_A_PIVOT = """
SELECT CAST(ts AS DATE) AS day,
       ROUND(SUM(CASE WHEN event_type='click' THEN value END),2) AS click,
       ROUND(SUM(CASE WHEN event_type='error' THEN value END),2) AS error,
       ROUND(SUM(CASE WHEN event_type='purchase' THEN value END),2) AS purchase,
       ROUND(SUM(CASE WHEN event_type='signup' THEN value END),2) AS signup,
       ROUND(SUM(CASE WHEN event_type='view' THEN value END),2) AS view
FROM events GROUP BY day ORDER BY day
"""


def q_f_unpivot(spark, sf_dir):
    """Unpivot/melt (wide->long): lineitem measure columns into
    (metric, val) rows. The melt itself is a zero-shuffle Expand —
    each input row fans out to n_measures rows inside its task; the
    only exchange in the plan is the presentation sort."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return (
        li.unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_extendedprice", "l_discount"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


SQL_F_UNPIVOT = """
SELECT l_orderkey, l_linenumber, metric, val FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
  FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
  FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
  FROM lineitem WHERE l_orderkey < 100
)
ORDER BY l_orderkey, l_linenumber, metric
"""


def q_stream_curation(spark, sf_dir):
    """Continuous corpus curation under the oracle gate: documents
    arrive in two waves (doc_id ranges), each folded in by
    incremental_curation — quality gate (n_chars >= 200), dedup
    against the already-curated corpus, keep-first within batch,
    idempotent batch-dir append. Because wave 1 holds the lower
    doc_id range, first-occurrence-per-batch composed with
    min-within-batch equals a GLOBAL keep-min-doc_id per text, which
    is exactly the row_number oracle. Final aggregate by lang."""
    import shutil
    import uuid

    from dataprocessingframework_spark.streaming import (
        incremental_curation,
        read_corpus,
    )

    base = f"/root/repo/.scratch/stream_cur_{uuid.uuid4().hex[:8]}"
    src, corpus, ckpt = f"{base}/src", f"{base}/corpus", f"{base}/ckpt"
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    schema = "doc_id long, text string, lang string, n_chars long"

    def run():
        return incremental_curation(
            spark, src, schema, corpus, ckpt,
            dedup_cols=["text"], order_col="doc_id",
            curate=lambda df: df.filter(F.col("n_chars") >= 200),
        )

    try:
        docs.filter(F.col("doc_id") < cut).write.mode("append").json(src)
        run()
        docs.filter(F.col("doc_id") >= cut).write.mode("append").json(src)
        run()
        res = (
            read_corpus(spark, corpus)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n_chars").alias("sum_chars"),
                F.min("doc_id").alias("min_doc_id"),
            )
            .orderBy("lang")
        )
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_STREAM_CURATION = """
WITH kept AS (
  SELECT doc_id, text, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents WHERE n_chars >= 200
)
SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc_id
FROM kept WHERE rn = 1 GROUP BY lang ORDER BY lang
"""


def q_ev_funnel(spark, sf_dir):
    """Conversion-funnel analytics over the events stream: users whose
    earliest view is followed by a click, then a purchase (strict
    event-time ordering at each stage), with mean stage-transition
    delays.

    Shape at 100 TB: every aggregate and join keys on user_id. Each
    stage shuffles only its filtered events, map-side combined to one
    row per user BEFORE the exchange, so shuffle volume is per-stage
    distinct users — not events; the user_id joins then add no
    exchange beyond those aggregates (observed plan: 5 exchanges all
    on user_id, zero cartesian). Delays are integral epoch-second
    diffs so the averages are bit-reproducible (exact integer sums,
    one final division).
    """
    ev = T(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    funnel = (
        views.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
    )
    sec = lambda c: F.unix_timestamp(F.col(c))  # noqa: E731
    return funnel.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_view_click_purchase"),
        F.round(F.avg(sec("t_click") - sec("t_view")), 2).alias(
            "avg_view_to_click_sec"
        ),
        F.round(F.avg(sec("t_purchase") - sec("t_click")), 2).alias(
            "avg_click_to_purchase_sec"
        ),
    )


SQL_EV_FUNNEL = """
WITH views AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), clicks AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN views v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), purchases AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN clicks c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT COUNT(v.t_view) AS n_view,
       COUNT(c.t_click) AS n_view_click,
       COUNT(p.t_purchase) AS n_view_click_purchase,
       ROUND(AVG(CAST(floor(epoch(c.t_click)) AS BIGINT)
                 - CAST(floor(epoch(v.t_view)) AS BIGINT)), 2)
         AS avg_view_to_click_sec,
       ROUND(AVG(CAST(floor(epoch(p.t_purchase)) AS BIGINT)
                 - CAST(floor(epoch(c.t_click)) AS BIGINT)), 2)
         AS avg_click_to_purchase_sec
FROM views v
LEFT JOIN clicks c ON v.user_id = c.user_id
LEFT JOIN purchases p ON v.user_id = p.user_id
"""


def q_stream_interval_join(spark, sf_dir):
    """Stream-stream time-interval join under the oracle gate:
    click-attribution — clicks within 30 minutes after a purchase by
    the same user. Both sides replayed through readStream from one
    staged directory, watermarked, joined with a closed range condition
    (bounded state), append-mode memory sink, availableNow trigger.
    The batch oracle is the identical range join in DuckDB."""
    import shutil
    import uuid

    from dataprocessingframework_spark.streaming import (
        stream_stream_interval_join,
    )

    events = T(spark, sf_dir, "events")
    stage_dir = f"/root/repo/.scratch/stream_ssj_{uuid.uuid4().hex[:8]}"
    qname = f"stream_ssj_{uuid.uuid4().hex[:8]}"
    events.write.mode("overwrite").parquet(stage_dir)

    def side(event_type, prefix):
        s = spark.readStream.schema(events.schema).parquet(stage_dir)
        return s.filter(F.col("event_type") == event_type).select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("ts").alias(f"{prefix}_ts"),
        )

    joined = stream_stream_interval_join(
        side("purchase", "p"),
        side("click", "c"),
        key="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
        horizon="30 minutes",
    ).select("user_id", "p_id", "c_id", "p_ts", "c_ts")
    try:
        sq = (
            joined.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()
        out = spark.table(qname).orderBy("p_id", "c_id").cache()
        out.count()
        return out
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)


SQL_STREAM_INTERVAL_JOIN = """
SELECT p.user_id, p.event_id AS p_id, c.event_id AS c_id,
       p.ts AS p_ts, c.ts AS c_ts
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 30 MINUTE
ORDER BY p_id, c_id
"""


# --------------------------------------------------------------------------
# §2.11 validators as queries
# --------------------------------------------------------------------------


def q_v2_key_unique(spark, sf_dir):
    dups = validators.duplicate_keys(
        T(spark, sf_dir, "lineitem"), ["l_orderkey", "l_linenumber"]
    )
    return dups.agg(F.count(F.lit(1)).alias("dup_cnt"))


SQL_V2 = (
    "SELECT COUNT(*) AS dup_cnt FROM (SELECT l_orderkey, l_linenumber "
    "FROM lineitem GROUP BY 1,2 HAVING COUNT(*) > 1)"
)


def q_v3_referential(spark, sf_dir):
    orphan = validators.orphans(
        T(spark, sf_dir, "orders"),
        T(spark, sf_dir, "customer"),
        "o_custkey",
        "c_custkey",
    )
    return orphan.agg(F.count(F.lit(1)).alias("orphan_cnt"))


SQL_V3 = (
    "SELECT COUNT(*) AS orphan_cnt FROM orders o WHERE NOT EXISTS "
    "(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)"
)


# --------------------------------------------------------------------------
# §2.2 metadata ops (W4-W6)
# --------------------------------------------------------------------------


def q_w4_update_columns(spark, sf_dir):
    orders = D(spark, sf_dir, "orders")
    new = T(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("t2")
    )
    return (
        orders.update_columns(new, "o_orderkey")
        .order_by("o_orderkey")
        .limit(100)
        .select("o_orderkey", F.round("t2", 2).alias("t2"))
        .df
    )


SQL_W4 = (
    "SELECT o.o_orderkey, ROUND(n.t2, 2) AS t2 FROM orders o JOIN "
    "(SELECT o_orderkey, o_totalprice*2 AS t2 FROM orders) n "
    "USING (o_orderkey) ORDER BY o_orderkey LIMIT 100"
)


def q_w1_roundtrip(spark, sf_dir):
    """W1/W3: write lineitem as csv shards, re-read via the shards
    scan (split_name injection), aggregate — round-trip identity
    (`processors/writers/shards_writer.py:17-181` semantics)."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.reader import DatasetReader
    from dataprocessingframework_spark.sources.writers import write_shards

    out = f"/root/repo/.scratch/w1_roundtrip_{uuid.uuid4().hex[:8]}"
    try:
        li = T(spark, sf_dir, "lineitem")
        write_shards(li, out, max_files_in_shard=5000)
        back = DatasetReader(spark).read_metadata_shards(out)
        res = back.df.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        res = res.cache()
        res.count()
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_W1 = (
    "SELECT COUNT(*) AS cnt, ROUND(SUM(l_quantity),2) AS sum_qty FROM lineitem"
)


def q_w_shards_native_roundtrip(spark, sf_dir):
    """Native DSv2 shards write+read round-trip (r13): documents ->
    ``df.write.format("dpf_shards")`` (commit-protocol writer, rolled
    shard pairs) -> ``spark.read.format("dpf_shards")`` -> aggregate.
    The text column carries real quotes/commas/newlines, so identity
    here pins the csv dialect through BOTH native paths; n_shards pins
    the rolling arithmetic (count/max_files_in_shard, ceil)."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.shards_source import (
        register_shards_source,
    )

    register_shards_source(spark)
    out = f"/root/repo/.scratch/w_native_{uuid.uuid4().hex[:8]}"
    try:
        docs = T(spark, sf_dir, "documents")
        (
            docs.repartition(1)
            .write.format("dpf_shards")
            .option("max_files_in_shard", "200")
            .mode("append")
            .save(out)
        )
        back = spark.read.format("dpf_shards").load(out)
        res = back.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.count_distinct("split_name").alias("n_shards"),
        )
        res = res.cache()
        res.count()
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_w_shards_meta_jvm(spark, sf_dir):
    """Metadata-only JVM fast path (r16 — VERDICT r15 item 6):
    documents -> native DSv2 shards write (publishes
    ``_schema.json``) -> ``read_metadata_shards(engine="jvm")`` — the
    whole-stage-codegen JVM csv scan with the published schema
    pinned: zero inference jobs, zero Python-worker Arrow hop.
    Aggregates every metadata column plus the derived split_name, so
    value identity pins the RFC4180 dialect (quotes/commas/embedded
    newlines in ``text``), the published-schema types, and the
    input_file_name-derived shard provenance against the oracle."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.reader import (
        DatasetReader,
    )
    from dataprocessingframework_spark.sources.shards_source import (
        register_shards_source,
    )

    register_shards_source(spark)
    out = f"/root/repo/.scratch/w_metajvm_{uuid.uuid4().hex[:8]}"
    try:
        docs = T(spark, sf_dir, "documents")
        (
            docs.repartition(1)
            .write.format("dpf_shards")
            .option("max_files_in_shard", "200")
            .mode("append")
            .save(out)
        )
        back = DatasetReader(spark).read_metadata_shards(
            out, engine="jvm"
        ).df
        res = back.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.count_distinct("lang").alias("n_langs"),
            F.count_distinct("source").alias("n_sources"),
            F.count_distinct("split_name").alias("n_shards"),
        )
        res = res.cache()
        res.count()
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_W_SHARDS_META_JVM = (
    "SELECT COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
    "CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_len, "
    "CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs, "
    "CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources, "
    "CAST(CEIL(COUNT(*) / 200.0) AS BIGINT) AS n_shards FROM documents"
)


SQL_W_SHARDS_NATIVE = (
    "SELECT COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
    "CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_len, "
    "CAST(CEIL(COUNT(*) / 200.0) AS BIGINT) AS n_shards FROM documents"
)


def q_w_shards_objectstore_roundtrip(spark, sf_dir):
    """Object-store shards lifecycle (r14): the SAME commit-protocol
    write + DSv2 read as ``w_shards_native_roundtrip``, but through
    the ``fakeobj://`` backend, which enforces S3-class semantics —
    whole-object atomic PUTs, copy+delete in place of rename, GET-only
    reads. Identity of the aggregate pins that the protocol's atomic
    points survive a store with no rename; ``cnt_shard0`` re-reads one
    shard through a ``split_name`` pushdown (whole-pair pruning on the
    object store) and pins the sequential 200-row rolling fill."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.shards_source import (
        register_shards_source,
    )

    register_shards_source(spark)
    backing = f"/root/repo/.scratch/w_objstore_{uuid.uuid4().hex[:8]}"
    out = f"fakeobj://{backing}"
    try:
        docs = T(spark, sf_dir, "documents")
        (
            docs.repartition(1)
            .write.format("dpf_shards")
            .option("max_files_in_shard", "200")
            .mode("append")
            .save(out)
        )
        back = spark.read.format("dpf_shards").load(out)
        full = back.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.count_distinct("split_name").alias("n_shards"),
        )
        pruned = (
            spark.read.format("dpf_shards")
            .load(out)
            .where(F.col("split_name") == "0")
            .agg(F.count(F.lit(1)).alias("cnt_shard0"))
        )
        res = full.crossJoin(pruned)
        res = res.cache()
        res.count()
        return res
    finally:
        shutil.rmtree(backing, ignore_errors=True)


SQL_W_SHARDS_OBJECTSTORE = (
    "SELECT COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
    "CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_len, "
    "CAST(CEIL(COUNT(*) / 200.0) AS BIGINT) AS n_shards, "
    "CAST(LEAST(200, COUNT(*)) AS BIGINT) AS cnt_shard0 FROM documents"
)


def q_w_shardedfiles_native_roundtrip(spark, sf_dir):
    """Sharded-files (W2/S3) through the DSv2 lifecycle (r14):
    documents + a real binary content column -> ``layout='dir'``
    commit-protocol write (N.csv + loose-file folder N/) -> same-source
    read. ``sum_content_chars`` decodes the loose members back to text,
    so identity pins the member bytes path end-to-end, not just the
    csv; ``n_ok`` pins the tolerant contract finding every member."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.shards_source import (
        register_shards_source,
    )

    register_shards_source(spark)
    out = f"/root/repo/.scratch/w_shardedfiles_{uuid.uuid4().hex[:8]}"
    try:
        docs = T(spark, sf_dir, "documents").select(
            "doc_id",
            "n_chars",
            F.concat(F.col("doc_id").cast("string"), F.lit(".txt")).alias(
                "name"
            ),
            F.encode("text", "UTF-8").alias("content"),
        )
        (
            docs.repartition(1)
            .write.format("dpf_shards")
            .option("max_files_in_shard", "200")
            .option("layout", "dir")
            .mode("append")
            .save(out)
        )
        back = (
            spark.read.format("dpf_shards")
            .option("layout", "dir")
            .load(out)
        )
        res = back.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length(F.decode("content", "UTF-8"))).alias(
                "sum_content_chars"
            ),
            F.count_distinct("split_name").alias("n_shards"),
            F.sum(F.col("is_correct").cast("long")).alias("n_ok"),
        )
        res = res.cache()
        res.count()
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_W_SHARDEDFILES_NATIVE = (
    "SELECT COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
    "CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_content_chars, "
    "CAST(CEIL(COUNT(*) / 200.0) AS BIGINT) AS n_shards, "
    "COUNT(*) AS n_ok FROM documents"
)


def q_w_shards_parquet_meta_roundtrip(spark, sf_dir):
    """Parquet metadata shards (r14): the reference's configurable
    ``datafiles_ext`` (`dataset_reader.py:174-190`) through the DSv2
    lifecycle — shard tables as ``N.parquet``, exact types (no csv
    inference), NESTED metadata carried natively (``words`` array).
    ``sum_words`` decodes the nested column back out, pinning the
    parquet meta path end to end; ``n_shards`` pins the rolling."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.shards_source import (
        register_shards_source,
    )

    register_shards_source(spark)
    out = f"/root/repo/.scratch/w_pqmeta_{uuid.uuid4().hex[:8]}"
    try:
        docs = T(spark, sf_dir, "documents").select(
            "doc_id",
            "n_chars",
            F.split("text", " ").alias("words"),
        )
        (
            docs.repartition(1)
            .write.format("dpf_shards")
            .option("max_files_in_shard", "200")
            .option("meta_format", "parquet")
            .mode("append")
            .save(out)
        )
        back = (
            spark.read.format("dpf_shards")
            .option("meta_format", "parquet")
            .load(out)
        )
        res = back.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.size("words")).alias("sum_words"),
            F.count_distinct("split_name").alias("n_shards"),
        )
        res = res.cache()
        res.count()
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_W_SHARDS_PARQUET_META = (
    "SELECT COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
    "CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS sum_words, "
    "CAST(CEIL(COUNT(*) / 200.0) AS BIGINT) AS n_shards FROM documents"
)


def q_w_shard_stats(spark, sf_dir):
    """Per-shard census (r14): documents -> rolled shard pairs ->
    ``shard_stats``. The per-shard ``rows`` column IS the rolling
    arithmetic (a single task fills shards sequentially at 200 rows),
    so the oracle derives every row from COUNT(*) alone;
    ``has_table``/``has_bytes`` pin that the driver-side stat pass
    found every file it claims to have measured."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.shards_source import (
        register_shards_source,
        shard_stats,
    )

    register_shards_source(spark)
    out = f"/root/repo/.scratch/w_census_{uuid.uuid4().hex[:8]}"
    try:
        docs = T(spark, sf_dir, "documents")
        (
            docs.repartition(1)
            .write.format("dpf_shards")
            .option("max_files_in_shard", "200")
            .mode("append")
            .save(out)
        )
        res = shard_stats(spark, out).select(
            "split_name",
            "rows",
            (F.col("table_bytes") > 0).alias("has_table"),
            (F.col("archive_bytes") == 0).alias("metadata_only"),
        ).orderBy("split_name")
        res = res.cache()
        res.count()
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_W_SHARD_STATS = """
WITH c AS (SELECT COUNT(*) AS cnt FROM documents),
shards AS (
  SELECT CAST(u.i AS VARCHAR) AS split_name,
         LEAST(200, c.cnt - u.i * 200) AS rows
  FROM c, UNNEST(range(CAST(CEIL(c.cnt / 200.0) AS BIGINT))) AS u(i)
)
SELECT split_name, CAST(rows AS BIGINT) AS rows,
       TRUE AS has_table, TRUE AS metadata_only
FROM shards ORDER BY split_name
"""


def q_w_update_metadata_native(spark, sf_dir):
    """W4 write-back through the commit protocol (r14): documents ->
    shards, then ``update_shard_metadata_native`` doubles ``n_chars``
    and adds a derived ``lang_up`` column via attempt-unique temps +
    a write-ahead rename plan; the re-read aggregate pins the merged
    metadata (doubled sums, new column), ``n_shards_touched`` pins
    the per-shard rewrite summary, and ``sum_text_len`` pins that the
    non-updated column survived the rewrite byte-exactly."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.shards_source import (
        register_shards_source,
        update_shard_metadata_native,
    )

    register_shards_source(spark)
    out = f"/root/repo/.scratch/w_updmeta_{uuid.uuid4().hex[:8]}"
    try:
        docs = T(spark, sf_dir, "documents")
        (
            docs.repartition(1)
            .write.format("dpf_shards")
            .option("max_files_in_shard", "200")
            .mode("append")
            .save(out)
        )
        upd = docs.select(
            "doc_id",
            (F.col("n_chars") * 2).alias("n_chars"),
            F.upper("lang").alias("lang_up"),
        )
        summary = update_shard_metadata_native(spark, out, upd, "doc_id")
        n_touched = summary.count()
        back = spark.read.format("dpf_shards").load(out)
        res = back.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").alias("sum_chars_doubled"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.count_distinct("lang_up").alias("n_langs_up"),
        ).withColumn("n_shards_touched", F.lit(n_touched).cast("long"))
        res = res.cache()
        res.count()
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_W_UPDATE_METADATA = (
    "SELECT COUNT(*) AS cnt, "
    "CAST(SUM(n_chars * 2) AS BIGINT) AS sum_chars_doubled, "
    "CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_len, "
    "CAST(COUNT(DISTINCT UPPER(lang)) AS BIGINT) AS n_langs_up, "
    "CAST(CEIL(COUNT(*) / 200.0) AS BIGINT) AS n_shards_touched "
    "FROM documents"
)


def q_stream_shards_sink(spark, sf_dir):
    """Streaming shard sink (r13): documents as an availableNow stream
    -> ``writeStream.format("dpf_shards")`` (per-batch commit markers,
    replay-idempotent) -> re-read through the DSv2 reader, aggregate.
    A SECOND availableNow run against the same checkpoint must append
    nothing (n_after_rerun pins the exactly-once contract in the
    oracle, not just in a test)."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.shards_source import (
        register_shards_source,
    )

    register_shards_source(spark)
    tag = uuid.uuid4().hex[:8]
    out = f"/root/repo/.scratch/stream_shards_{tag}"
    ckpt = f"/root/repo/.scratch/stream_shards_ckpt_{tag}"
    stage_dir = f"/root/repo/.scratch/stream_shards_src_{tag}"
    try:
        docs = T(spark, sf_dir, "documents")
        # stage a directory copy (readStream sources need a dir)
        docs.write.mode("overwrite").parquet(stage_dir)

        def run() -> None:
            q = (
                spark.readStream.schema(docs.schema)
                .parquet(stage_dir)
                .writeStream.format("dpf_shards")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run()
        n_first = spark.read.format("dpf_shards").load(out).count()
        run()  # replay/no-new-data: the sink must not grow
        back = spark.read.format("dpf_shards").load(out)
        res = back.agg(
            F.count(F.lit(1)).alias("n_after_rerun"),
            F.lit(int(n_first)).alias("n_first"),
            F.sum("n_chars").alias("sum_chars"),
        )
        res = res.cache()
        res.count()
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(stage_dir, ignore_errors=True)


SQL_STREAM_SHARDS_SINK = (
    "SELECT COUNT(*) AS n_after_rerun, COUNT(*) AS n_first, "
    "CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM documents"
)


def q_w_shards_compact(spark, sf_dir):
    """Shard compaction (r13): documents written as a deliberately
    tiny-sharded dataset (50 rows/pair — the streaming sink's
    small-files tail), then ``compact_shards`` merges the undersized
    pairs into ceil(n/200) right-sized ones behind its two-phase
    manifest commit. The oracle pins the WHOLE compaction arithmetic
    (retired count, new count, rows moved) plus content identity
    after the rewrite."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.shards_source import (
        compact_shards,
        register_shards_source,
    )

    register_shards_source(spark)
    out = f"/root/repo/.scratch/w_compact_{uuid.uuid4().hex[:8]}"
    try:
        docs = T(spark, sf_dir, "documents")
        (
            docs.repartition(1)
            .write.format("dpf_shards")
            .option("max_files_in_shard", "50")
            .mode("append")
            .save(out)
        )
        res = compact_shards(
            spark, out, max_files_in_shard=200, min_rows=60
        )
        back = spark.read.format("dpf_shards").load(out)
        agg = back.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").alias("sum_chars"),
            F.count_distinct("split_name").alias("n_shards_after"),
        ).withColumns(
            {
                "n_retired": F.lit(len(res["retired"])).cast("long"),
                "n_new": F.lit(len(res["new"])).cast("long"),
                "rows_moved": F.lit(res["rows"]).cast("long"),
            }
        )
        agg = agg.cache()
        agg.count()
        return agg
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_W_SHARDS_COMPACT = (
    "SELECT COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
    "CAST(CEIL(COUNT(*) / 200.0) AS BIGINT) AS n_shards_after, "
    "CAST(CEIL(COUNT(*) / 50.0) AS BIGINT) AS n_retired, "
    "CAST(CEIL(COUNT(*) / 200.0) AS BIGINT) AS n_new, "
    "COUNT(*) AS rows_moved FROM documents"
)


def q_w5_rename(spark, sf_dir):
    return (
        D(spark, sf_dir, "orders")
        .rename_columns({"o_totalprice": "total"})
        .order_by("o_orderkey")
        .limit(10)
        .select("o_orderkey", "total")
        .df
    )


SQL_W5 = (
    "SELECT o_orderkey, o_totalprice AS total FROM orders ORDER BY o_orderkey LIMIT 10"
)


def q_w6_delete(spark, sf_dir):
    return (
        D(spark, sf_dir, "orders")
        .delete_columns(
            ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
            protected=["o_orderkey"],
        )
        .order_by("o_orderkey")
        .limit(10)
        .df
    )


SQL_W6 = "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 10"


# --------------------------------------------------------------------------
# UDF contracts under the oracle gate (U1/U2 + pipeline)
# --------------------------------------------------------------------------


def q_u1_column_filter(spark, sf_dir):
    """U1 ColumnFilter (pandas path) checked against pure SQL: the
    TokenStatsFilter kernel must agree with a relational restatement."""
    from dataprocessingframework_spark.filters.text_filters import TokenStatsFilter

    out = TokenStatsFilter()(T(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_tokens_pd", "avg_token_len"
    ).orderBy("doc_id")


SQL_U1 = """
SELECT doc_id,
  CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n_tokens_pd,
  ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        / len(list_filter(string_split(text,' '), x -> x <> '')), 4) AS avg_token_len
FROM documents ORDER BY doc_id
"""


def q_u2_data_filter(spark, sf_dir):
    """U2 DataFilter checked against SQL: deterministic synthetic media
    generated from table columns, probed by ImageInfoFilter, with the
    dimensions re-derivable relationally."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from dataprocessingframework_spark.filters.kernels import (
        ImageInfoFilter,
        encode_fake_image,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")

    gen_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_chars", LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def gen(pdfs):
        for pdf in pdfs:
            content = [
                bytearray(
                    encode_fake_image(
                        np.zeros(
                            ((int(d) % 16) + 1, (int(n) % 32) + 1, 3),
                            dtype=np.uint8,
                        )
                    )
                )
                for d, n in zip(pdf.doc_id, pdf.n_chars)
            ]
            yield pd.DataFrame(
                {"doc_id": pdf.doc_id, "n_chars": pdf.n_chars, "content": content}
            )

    with_media = docs.mapInPandas(gen, gen_schema)
    probed = ImageInfoFilter()(with_media)
    return probed.select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("channels").cast("long").alias("channels"),
        "img_is_correct",
    ).orderBy("doc_id")


SQL_U2 = """
SELECT doc_id, (n_chars % 32) + 1 AS width, (doc_id % 16) + 1 AS height,
  CAST(3 AS BIGINT) AS channels, true AS img_is_correct
FROM documents ORDER BY doc_id
"""


def q_k2_phash(spark, sf_dir):
    """K2 perceptual hash under the oracle gate (the reference's
    flagship README demo hashes images with phash,
    `filters/images/hash_filters.py:31-86`). Images are a pure function
    of ``doc_id % 8`` — eight deterministic 32x32x3 patterns — hashed
    by the real PHashFilter (decode → DCT → median threshold → hex)
    over the real mapInPandas plumbing; the oracle is the golden
    class→hex mapping (the phash DCT kernel itself is golden- and
    property-tested in tests/test_filters.py)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from dataprocessingframework_spark.filters.kernels import (
        PHashFilter,
        encode_fake_image,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id")

    gen_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def gen(pdfs):
        r = np.arange(32)[:, None, None]
        c = np.arange(32)[None, :, None]
        ch = np.arange(3)[None, None, :]
        imgs = [
            bytearray(
                encode_fake_image(
                    ((r * 31 + c * 7 + ch * 13 + k * 17) % 256).astype(np.uint8)
                )
            )
            for k in range(8)
        ]
        for pdf in pdfs:
            yield pd.DataFrame(
                {
                    "doc_id": pdf.doc_id,
                    "content": [imgs[int(d) % 8] for d in pdf.doc_id],
                }
            )

    with_media = docs.mapInPandas(gen, gen_schema)
    hashed = PHashFilter()(with_media)
    return hashed.select("doc_id", "image_phash_8").orderBy("doc_id")


_K2_GOLDENS = [
    "c09fc09fc19fc097", "d397d196c295c195", "d594ff85c491c295",
    "fac07ad56ad16ac0", "ebd76ac26ac26ac0", "ebca6bc86aca6ac0",
    "ad4a2dcb2d4a2d6a", "a56e246b2d6a356a",
]
SQL_K2_PHASH = (
    "SELECT doc_id, CASE CAST(doc_id % 8 AS INT) "
    + " ".join(f"WHEN {k} THEN '{h}'" for k, h in enumerate(_K2_GOLDENS))
    + " END AS image_phash_8 FROM documents ORDER BY doc_id"
)


def q_pipeline_stages(spark, sf_dir):
    """Pipeline runner (filter stage -> keep-first dedup stage) under
    the oracle gate (`pipelines/filter_pipeline.py` semantics)."""
    from dataprocessingframework_spark.plans import Pipeline

    p = (
        Pipeline()
        .add_dataframe_filter(lambda df: df.filter(F.col("lang") == "en"))
        .add_dedup(["n_chars"], order_col="doc_id")
    )
    out, reports = p.run(D(spark, sf_dir, "documents"))
    assert all(r.status == "ok" for r in reports)
    return out.select("doc_id", "n_chars").order_by("doc_id").df


SQL_PIPELINE = (
    "SELECT MIN(doc_id) AS doc_id, n_chars FROM documents WHERE lang = 'en' "
    "GROUP BY n_chars ORDER BY doc_id"
)


# --------------------------------------------------------------------------
# beyond-reference: text analysis (north star)
# --------------------------------------------------------------------------


def q_tx_token_stats(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .select(
            "doc_id",
            text_analysis.token_count("text").cast("long").alias("n_tokens"),
            text_analysis.bpe_token_count("text")
            .cast("long")
            .alias("n_bpe_tokens"),
            text_analysis.char_count("text").cast("long").alias("n_chars_computed"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


SQL_TX_TOKENS = (
    "SELECT doc_id, CAST(len(list_filter(string_split(text,' '), x -> x <> '')) "
    "AS BIGINT) AS n_tokens, "
    f"CAST(len(regexp_extract_all(text, '{text_analysis.BPE_TOKEN_PATTERN}')) "
    "AS BIGINT) AS n_bpe_tokens, "
    "CAST(length(text) AS BIGINT) AS n_chars_computed "
    "FROM documents ORDER BY doc_id LIMIT 200"
)

_STOPS_SQL = ",".join(f"'{w}'" for w in text_analysis.STOPWORDS_EN)


def q_tx_quality(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.round(text_analysis.punct_ratio("text"), 4).alias("punct_ratio"),
            F.round(text_analysis.stopword_ratio("text"), 4).alias("stopword_ratio"),
            text_analysis.quality_score("text").alias("quality"),
        )
        .orderBy("doc_id")
    )


SQL_TX_QUALITY = f"""
WITH t AS (
  SELECT doc_id,
    len(list_filter(string_split(text,' '), x -> x <> '')) AS n,
    length(text) AS total,
    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
    len(list_filter(string_split(text,' '), x -> x IN ({_STOPS_SQL}))) AS hits
  FROM documents
)
SELECT doc_id,
  ROUND(CASE WHEN total > 0 THEN CAST(punct AS DOUBLE)/total ELSE 0.0 END, 4) AS punct_ratio,
  ROUND(CASE WHEN n > 0 THEN CAST(hits AS DOUBLE)/n ELSE 0.0 END, 4) AS stopword_ratio,
  ROUND((LEAST(n/20.0, 1.0)
       + LEAST(CASE WHEN n > 0 THEN CAST(hits AS DOUBLE)/n ELSE 0.0 END * 5.0, 1.0)
       + (1.0 - LEAST(CASE WHEN total > 0 THEN CAST(punct AS DOUBLE)/total ELSE 0.0 END * 4.0, 1.0)))/3.0,
    4) AS quality
FROM t ORDER BY doc_id
"""


def q_tx_langid(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .select("doc_id", text_analysis.lang_id("text").alias("lang_pred"))
        .orderBy("doc_id")
    )


def _lang_hits_sql(lang: str) -> str:
    words = ",".join(f"'{w}'" for w in text_analysis.LANG_MARKERS[lang])
    return (
        f"len(list_filter(list_filter(string_split(text,' '), x -> x <> ''), "
        f"x -> x IN ({words}))) AS h_{lang}"
    )


SQL_TX_LANGID = f"""
WITH t AS (
  SELECT doc_id,
    {_lang_hits_sql('en')},
    {_lang_hits_sql('es')},
    {_lang_hits_sql('de')},
    {_lang_hits_sql('fr')}
  FROM documents
)
SELECT doc_id,
  CASE WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr AND h_en > 0 THEN 'en'
       WHEN h_es >= h_de AND h_es >= h_fr AND h_es > 0 THEN 'es'
       WHEN h_de >= h_fr AND h_de > 0 THEN 'de'
       WHEN h_fr > 0 THEN 'fr'
       ELSE 'unk' END AS lang_pred
FROM t ORDER BY doc_id
"""


def q_tx_fingerprint(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .select("doc_id", text_analysis.fingerprint("text").alias("fingerprint"))
        .orderBy("doc_id")
        .limit(200)
    )


SQL_TX_FINGERPRINT = (
    r"SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint "
    "FROM documents ORDER BY doc_id LIMIT 200"
)


def q_tx_repetition(spark, sf_dir):
    """Gopher-style repetition signals (word-level; no shuffle)."""
    return text_analysis.repetition_metrics(
        T(spark, sf_dir, "documents")
    ).orderBy("doc_id")


SQL_TX_REPETITION = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id, toks, len(toks) AS n,
    CASE WHEN len(toks) >= 2
      THEN list_transform(generate_series(1, len(toks)-1),
                          i -> toks[i] || ' ' || toks[i+1])
      ELSE CAST([] AS VARCHAR[]) END AS bi
  FROM t
)
SELECT doc_id,
  CAST(n AS BIGINT) AS n_words,
  ROUND(CASE WHEN n > 0
    THEN CAST(len(list_distinct(toks)) AS DOUBLE)/n ELSE 0.0 END, 4)
    AS distinct_word_ratio,
  ROUND(CASE WHEN n > 0
    THEN CAST(list_max(list_transform(list_distinct(toks),
         w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)/n
    ELSE 0.0 END, 4) AS top_word_fraction,
  ROUND(CASE WHEN len(bi) > 0
    THEN 1.0 - CAST(len(list_distinct(bi)) AS DOUBLE)/len(bi)
    ELSE 0.0 END, 4) AS dup_bigram_fraction
FROM m ORDER BY doc_id
"""

# the corpus carries no real PII, so the scrub query INJECTS a
# deterministic email / phone / IPv4 per row, then scrubs — counts are
# provably 1/1/1 and the redacted text is oracle-hashable
def _pii_inject_spark():
    # built lazily: Column constructors need an active SparkContext
    return [
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" at 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1"),
    ]
_PII_INJECT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com or +1 555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' at 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'"
)


def q_tx_pii_scrub(spark, sf_dir):
    """PII redaction over deterministically-injected emails/IPs/phones."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.col("text"), *_pii_inject_spark()).alias("text")
    )
    return text_analysis.pii_scrub(docs).orderBy("doc_id")


def _pii_scrub_sql() -> str:
    pats = text_analysis.PII_PATTERNS
    counts = ",\n  ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in pats
    )
    scrub = "t"
    for _, pat, repl in pats:
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    return f"""
WITH inj AS (SELECT doc_id, {_PII_INJECT_SQL} AS t FROM documents)
SELECT doc_id,
  {counts},
  {scrub} AS scrubbed
FROM inj ORDER BY doc_id
"""


SQL_TX_PII_SCRUB = _pii_scrub_sql()


def q_tx_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs vs the doc_id%97==0 'benchmark'
    slice, 3-gram overlap, flag at >=5 shared distinct grams."""
    docs = T(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return text_analysis.decontaminate(
        corpus, bench, n=3, threshold=5
    ).orderBy("doc_id")


SQL_TX_DECONTAMINATE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS t
  FROM documents
), ng AS (
  SELECT doc_id, CASE WHEN len(t) >= 3
    THEN list_transform(generate_series(1, len(t)-2),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
    ELSE CAST([] AS VARCHAR[]) END AS gs
  FROM toks
), cg AS (
  SELECT DISTINCT doc_id, g
  FROM (SELECT doc_id, unnest(gs) AS g FROM ng WHERE doc_id % 97 <> 0)
), bg AS (
  SELECT DISTINCT g
  FROM (SELECT unnest(gs) AS g FROM ng WHERE doc_id % 97 = 0)
), ov AS (
  SELECT doc_id, count(*) AS n_overlap FROM cg JOIN bg USING (g)
  GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
  COALESCE(o.n_overlap, 0) >= 5 AS contaminated
FROM documents d LEFT JOIN ov o ON d.doc_id = o.doc_id
WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id
"""


def q_tx_dup_passages(spark, sf_dir):
    """Passage-duplication signal: per doc, fraction of its 5-grams
    appearing in >=2 docs (boilerplate/template detector)."""
    return text_analysis.duplicate_passage_stats(
        T(spark, sf_dir, "documents"), n=5, min_docs=2
    ).orderBy("doc_id")


SQL_TX_DUP_PASSAGES = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS t
  FROM documents
), ng AS (
  SELECT doc_id, CASE WHEN len(t) >= 5
    THEN list_distinct(list_transform(generate_series(1, len(t)-4),
         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
    ELSE CAST([] AS VARCHAR[]) END AS gs
  FROM toks
), pairs AS (
  SELECT doc_id, unnest(gs) AS g FROM ng
), gdf AS (
  SELECT g, count(*) AS df FROM pairs GROUP BY g
), per_doc AS (
  SELECT p.doc_id, count(*) AS n_grams,
         sum(CASE WHEN gdf.df >= 2 THEN 1 ELSE 0 END) AS n_dup_grams
  FROM pairs p JOIN gdf USING (g) GROUP BY p.doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(pd.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(COALESCE(pd.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
  ROUND(CASE WHEN COALESCE(pd.n_grams, 0) > 0
    THEN CAST(pd.n_dup_grams AS DOUBLE)/pd.n_grams ELSE 0.0 END, 4)
    AS dup_fraction
FROM documents d LEFT JOIN per_doc pd ON d.doc_id = pd.doc_id
ORDER BY d.doc_id
"""


def q_tx_tfidf(spark, sf_dir):
    """Top-3 characteristic terms per doc by tf-idf (keyword
    extraction for curation dashboards / topic-balance sampling)."""
    return text_analysis.tfidf_top_terms(
        T(spark, sf_dir, "documents"), k=3
    ).orderBy("doc_id", "rnk")


SQL_TX_TFIDF = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf * ln(n.n_docs / d.df) AS tfidf
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, ROUND(tfidf,4) AS tfidf, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk
"""


def q_tx_zipf(spark, sf_dir):
    """Corpus Zipf rank-frequency slope over the top-1000 terms."""
    return text_analysis.zipf_slope(T(spark, sf_dir, "documents"), top_n=1000)


SQL_TX_ZIPF = """
WITH toks AS (
  SELECT unnest(list_filter(string_split(text,' '), x -> x <> '')) AS term
  FROM documents
), freq AS (
  SELECT term, COUNT(*) AS freq FROM toks GROUP BY term
), top AS (
  SELECT term, freq FROM freq ORDER BY freq DESC, term LIMIT 1000
), ranked AS (
  SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS DOUBLE)) AS x,
         ln(CAST(freq AS DOUBLE)) AS y
  FROM top
)
SELECT COALESCE(ROUND(regr_slope(y, x),4), 0.0) AS zipf_slope,
       CAST(COUNT(*) AS BIGINT) AS n_terms
FROM ranked
"""


def q_tx_unigram_nll(spark, sf_dir):
    """Per-doc mean unigram NLL (fluency/outlier curation signal)."""
    return text_analysis.unigram_nll(
        T(spark, sf_dir, "documents")
    ).orderBy("doc_id")


SQL_TX_UNIGRAM_NLL = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS term
  FROM documents
), cnt AS (
  SELECT term, COUNT(*) AS c FROM toks GROUP BY term
), tot AS (SELECT SUM(c) AS n_total FROM cnt)
SELECT t.doc_id,
       ROUND(AVG(-ln(cnt.c / tot.n_total)), 4) AS mean_nll,
       COUNT(*) AS n_tokens
FROM toks t JOIN cnt USING (term) CROSS JOIN tot
GROUP BY t.doc_id ORDER BY t.doc_id
"""


def q_tx_nll_buckets(spark, sf_dir):
    """CCNet-style corpus split into head/middle/tail thirds by
    unigram-NLL (the perplexity-bucketing curation move). Scale-safe
    formulation: thresholds come from ONE percentile aggregate
    broadcast back over the corpus — never a global ntile window,
    which would sort the whole corpus into a single partition at
    100 TB."""
    nll = text_analysis.unigram_nll(T(spark, sf_dir, "documents"))
    thr = nll.agg(
        F.expr(
            "percentile(mean_nll, array(1.0D/3.0D, 2.0D/3.0D))"
        ).alias("t")
    )
    bucket = (
        F.when(F.col("mean_nll") <= F.col("t")[0], "head")
        .when(F.col("mean_nll") <= F.col("t")[1], "middle")
        .otherwise("tail")
    )
    return (
        nll.crossJoin(F.broadcast(thr))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("mean_nll"), 4).alias("avg_nll"),
        )
        .orderBy("bucket")
    )


SQL_TX_NLL_BUCKETS = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS term
  FROM documents
), cnt AS (
  SELECT term, COUNT(*) AS c FROM toks GROUP BY term
), tot AS (SELECT SUM(c) AS n_total FROM cnt),
nll AS (
  SELECT t.doc_id, ROUND(AVG(-ln(cnt.c / tot.n_total)), 4) AS mean_nll
  FROM toks t JOIN cnt USING (term) CROSS JOIN tot
  GROUP BY t.doc_id
), thr AS (
  SELECT quantile_cont(mean_nll, 1.0/3) AS t1,
         quantile_cont(mean_nll, 2.0/3) AS t2
  FROM nll
)
SELECT CASE WHEN mean_nll <= t1 THEN 'head'
            WHEN mean_nll <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs, ROUND(AVG(mean_nll), 4) AS avg_nll
FROM nll CROSS JOIN thr
GROUP BY bucket ORDER BY bucket
"""


def q_w_hive_partitioned(spark, sf_dir):
    """Hive-partitioned layout round-trip: events written into
    event_type=... directories, re-read with a partition predicate
    (pruned at the DIRECTORY level — PartitionFilters, no footer
    reads in pruned dirs), aggregated per day."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.layout import (
        write_hive_partitioned,
    )

    out = f"/root/repo/.scratch/hive_{uuid.uuid4().hex[:8]}"
    try:
        write_hive_partitioned(
            T(spark, sf_dir, "events"), out, ["event_type"]
        )
        back = spark.read.parquet(out).filter(
            F.col("event_type").isin("purchase", "signup")
        )
        res = (
            back.groupBy(
                F.to_date("ts").alias("day"),
                F.col("event_type").cast("string").alias("event_type"),
            )
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .orderBy("day", "event_type")
        )
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_W_HIVE_PARTITIONED = """
SELECT CAST(ts AS DATE) AS day, event_type,
       COUNT(*) AS cnt, ROUND(SUM(value),2) AS sum_value
FROM events WHERE event_type IN ('purchase','signup')
GROUP BY day, event_type ORDER BY day, event_type
"""


def q_a_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlations of the lineitem measures in ONE
    aggregation pass (no per-pair scans): corr is a partial/final
    combinable aggregate, so the exchange carries a fixed handful of
    moment rows regardless of table size."""
    li = T(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.round(F.corr(a, b), 4).alias(f"corr_{a}_{b}"))
    return li.agg(*aggs)


SQL_A_CORR_MATRIX = """
SELECT ROUND(corr(l_quantity, l_extendedprice),4) AS corr_l_quantity_l_extendedprice,
       ROUND(corr(l_quantity, l_discount),4) AS corr_l_quantity_l_discount,
       ROUND(corr(l_quantity, l_tax),4) AS corr_l_quantity_l_tax,
       ROUND(corr(l_extendedprice, l_discount),4) AS corr_l_extendedprice_l_discount,
       ROUND(corr(l_extendedprice, l_tax),4) AS corr_l_extendedprice_l_tax,
       ROUND(corr(l_discount, l_tax),4) AS corr_l_discount_l_tax
FROM lineitem
"""


def q_tx_pack_sequences(spark, sf_dir):
    """Deterministic sequence packing into 1024-token bins, sharded by
    md5 bucket of the doc id (per-shard packing, the loader layout)."""
    return text_analysis.pack_sequences(
        T(spark, sf_dir, "documents"), context_len=1024
    ).orderBy("shard", "doc_id")


SQL_TX_PACK_SEQUENCES = """
WITH s AS (
  SELECT doc_id,
    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
      % 64 AS shard,
    CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT)
      AS n_tokens
  FROM documents
), r AS (
  SELECT doc_id, shard, n_tokens,
    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tokens
  FROM s
)
SELECT doc_id, shard, n_tokens,
  CAST(FLOOR((cum_tokens - n_tokens) / 1024.0) AS BIGINT) AS bin_id
FROM r ORDER BY shard, doc_id
"""


def q_tx_budget_mix(spark, sf_dir):
    """Quality-weighted mixing: per source, best docs until a 700-token
    budget is filled (running window sum, deterministic tie-break)."""
    return (
        text_analysis.budget_mix(
            T(spark, sf_dir, "documents"), token_budget=700
        )
        .withColumn("cum_tokens", F.col("cum_tokens").cast("long"))
        .orderBy("source", "cum_tokens", "doc_id")
    )


SQL_TX_BUDGET_MIX = f"""
WITH t AS (
  SELECT doc_id, source,
    len(list_filter(string_split(text,' '), x -> x <> '')) AS n,
    length(text) AS total,
    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
    len(list_filter(string_split(text,' '), x -> x IN ({_STOPS_SQL}))) AS hits
  FROM documents
), s AS (
  SELECT doc_id, source, CAST(n AS BIGINT) AS n_tokens,
    ROUND((LEAST(n/20.0, 1.0)
         + LEAST(CASE WHEN n > 0 THEN CAST(hits AS DOUBLE)/n ELSE 0.0 END * 5.0, 1.0)
         + (1.0 - LEAST(CASE WHEN total > 0 THEN CAST(punct AS DOUBLE)/total ELSE 0.0 END * 4.0, 1.0)))/3.0,
      4) AS quality
  FROM t
), r AS (
  SELECT doc_id, source, quality, n_tokens,
    CAST(SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY quality DESC, doc_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tokens
  FROM s
)
SELECT doc_id, source, quality, n_tokens, cum_tokens FROM r
WHERE cum_tokens <= 700 ORDER BY source, cum_tokens, doc_id
"""


# --------------------------------------------------------------------------
# beyond-reference: dedup sketches (north star)
# --------------------------------------------------------------------------


def q_dd_exact_text(spark, sf_dir):
    """Exact content dedup: one surviving doc_id per distinct text."""
    kept = (
        T(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
        .orderBy("keep_id")
    )
    return kept


SQL_DD_EXACT = (
    "SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY text ORDER BY keep_id"
)

_WORDS_CTE = (
    "WITH words AS (SELECT DISTINCT doc_id, w FROM "
    "(SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) t "
    "WHERE w <> '')"
)


def q_dd_minhash(spark, sf_dir):
    return dedup.minhash_signatures(
        T(spark, sf_dir, "documents"), "text", "doc_id", num_hashes=4
    ).orderBy("doc_id")


def _minhash_sql(k: int = 4) -> str:
    mins = ", ".join(
        f"MIN((h * {a} + {b}) % {P}) AS mh{i}"
        for i, (a, b) in enumerate(minhash_coeffs(k))
    )
    return (
        f"{_WORDS_CTE}, "
        "h AS (SELECT doc_id, CAST(concat('0x', substr(md5(w),1,15)) AS BIGINT) "
        f"% {P} AS h FROM words) "
        f"SELECT doc_id, {mins} FROM h GROUP BY doc_id ORDER BY doc_id"
    )


SQL_DD_MINHASH = _minhash_sql(4)


def q_dd_simhash(spark, sf_dir):
    return dedup.simhash(
        T(spark, sf_dir, "documents"), "text", "doc_id", bits=16
    ).orderBy("doc_id")


def _simhash_sql(bits: int = 16) -> str:
    sums = ", ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits)
    )
    bitsum = " + ".join(
        f"CASE WHEN s{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END"
        for j in range(bits)
    )
    return (
        f"{_WORDS_CTE}, "
        "h AS (SELECT doc_id, CAST(concat('0x', substr(md5(w),1,15)) AS BIGINT) AS h "
        "FROM words), "
        f"s AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id) "
        f"SELECT doc_id, CAST({bitsum} AS BIGINT) AS simhash FROM s ORDER BY doc_id"
    )


SQL_DD_SIMHASH = _simhash_sql(16)


def q_dd_hamming(spark, sf_dir):
    """SimHash + banded Hamming near-dup. bands=4 > max_hamming=3, so
    the banding is pigeonhole-EXACT and the whole pipeline (fingerprint
    + pair generation) hash-matches a quadratic DuckDB scan."""
    sig = dedup.simhash(T(spark, sf_dir, "documents"), "text", "doc_id", bits=16)
    return dedup.hamming_near_dup(
        sig, "simhash", "doc_id", max_hamming=3, bands=4, bits=16
    ).orderBy("id_a", "id_b")


SQL_DD_HAMMING = f"""
WITH sh AS ({_simhash_sql(16).replace("ORDER BY doc_id", "")})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY id_a, id_b
"""


def q_dd_jaccard(spark, sf_dir):
    return dedup.jaccard_pairs(
        T(spark, sf_dir, "documents"), "text", "doc_id", threshold=0.5
    ).orderBy("id_a", "id_b")


SQL_DD_JACCARD = f"""
{_WORDS_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, ROUND(CAST(i AS DOUBLE)/(sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.5
ORDER BY id_a, id_b
"""


def q_dd_clusters(spark, sf_dir):
    """Near-dup clustering: Jaccard>=0.8 edges -> connected components
    (min-label). The transitive-dedup step the reference lacks; oracle
    is a DuckDB recursive CTE over the identical edge definition."""
    docs = T(spark, sf_dir, "documents")
    edges = dedup.jaccard_pairs(docs, "text", "doc_id", threshold=0.8)
    cc = dedup.connected_components(
        edges, all_nodes=docs.select("doc_id"), id_a="id_a", id_b="id_b"
    )
    return cc.select(
        F.col("node").alias("doc_id"), F.col("cluster")
    ).orderBy("doc_id")


SQL_DD_CLUSTERS = f"""
WITH RECURSIVE
words AS (SELECT DISTINCT doc_id, w FROM
  (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) t
  WHERE w <> ''),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
edges AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8),
bidir AS (SELECT id_a AS src, id_b AS dst FROM edges
          UNION ALL SELECT id_b, id_a FROM edges),
cc AS (
  SELECT doc_id, doc_id AS label FROM documents
  UNION
  SELECT b.dst AS doc_id, LEAST(cc.label, b.dst) AS label
  FROM cc JOIN bidir b ON cc.doc_id = b.src
)
SELECT doc_id, MIN(label) AS cluster FROM cc GROUP BY doc_id ORDER BY doc_id
"""


def q_dd_clusters_lsh(spark, sf_dir):
    """The 100 TB dedup composition, end-to-end under the oracle:
    MinHash signatures -> LSH banding candidates -> connected
    components. Unlike dd_clusters (exact-Jaccard edges, quadratic
    verification), this is the path that actually runs at scale — LSH
    prunes the pair space before any pairwise work. Both engines build
    the IDENTICAL edge set from md5-portable minhashes, so even the
    approximate pipeline is hash-checkable."""
    docs = T(spark, sf_dir, "documents")
    edges = dedup.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=8, bands=4, bucket_key="md5"
    )
    cc = dedup.connected_components(
        edges, all_nodes=docs.select("doc_id"), id_a="id_a", id_b="id_b"
    )
    return cc.select(
        F.col("node").alias("doc_id"), F.col("cluster")
    ).orderBy("doc_id")


def _lsh_band_sql(num_hashes: int, bands: int) -> str:
    rpb = num_hashes // bands
    parts = []
    for b in range(bands):
        cols = " , ',' , ".join(
            f"CAST(mh{b * rpb + j} AS VARCHAR)" for j in range(rpb)
        )
        parts.append(
            f"SELECT doc_id, {b} AS band, md5(concat({cols})) AS bucket FROM sig"
        )
    return " UNION ALL ".join(parts)


SQL_DD_CLUSTERS_LSH = f"""
WITH RECURSIVE
sig AS ({_minhash_sql(8).replace(" ORDER BY doc_id", "")}),
buckets AS ({_lsh_band_sql(8, 4)}),
edges AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
                AND a.doc_id < b.doc_id),
bidir AS (SELECT id_a AS src, id_b AS dst FROM edges
          UNION ALL SELECT id_b, id_a FROM edges),
cc AS (
  SELECT doc_id, doc_id AS label FROM documents
  UNION
  SELECT b.dst AS doc_id, LEAST(cc.label, b.dst) AS label
  FROM cc JOIN bidir b ON cc.doc_id = b.src
)
SELECT doc_id, MIN(label) AS cluster FROM cc GROUP BY doc_id ORDER BY doc_id
"""


def q_dd_incremental_clusters(spark, sf_dir):
    """Continuous-ingest CLUSTER MAINTENANCE under the full oracle:
    the lower doc_id half is clustered first (its own LSH edges +
    star contraction); the upper half then arrives as a batch and its
    edges (batch-batch and batch-corpus) merge into the existing
    labels via incremental_connected_components — history is touched
    only through its label table. The oracle is the SAME recursive
    CTE as dd_clusters_lsh over ALL documents, so the driver checks
    the core claim: incremental maintenance == full re-clustering.

    max_bucket_size=None keeps subset-consistency exact (a capped
    run's star-collapse depends on bucket sizes, which differ between
    the corpus-only and full runs)."""
    docs = T(spark, sf_dir, "documents")
    cut = docs.agg(
        F.floor(F.expr("percentile(doc_id, 0.5)")).cast("long")
    ).collect()[0][0]
    corpus = docs.filter(F.col("doc_id") < cut)
    wave1 = dedup.minhash_lsh_candidates(
        corpus, "text", "doc_id", num_hashes=8, bands=4,
        bucket_key="md5", max_bucket_size=None,
    )
    labels1 = dedup.connected_components_star(
        wave1, all_nodes=corpus.select("doc_id")
    )
    full_pairs = dedup.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=8, bands=4,
        bucket_key="md5", max_bucket_size=None,
    )
    wave2 = full_pairs.filter(
        (F.col("id_a") >= cut) | (F.col("id_b") >= cut)
    )
    cc = dedup.incremental_connected_components(labels1, wave2)
    # batch docs with no edges never enter the pair relation: restore
    # them as their own singletons via a left join on the full id set
    return (
        docs.select("doc_id")
        .join(cc, docs["doc_id"] == cc["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster"), F.col("doc_id")).alias("cluster"),
        )
        .orderBy("doc_id")
    )


def q_dd_incremental_near_dup(spark, sf_dir):
    """Continuous-ingest NEAR-dup gate under the full oracle: the
    lower doc_id half plays the corpus, the upper half the arriving
    batch; batch LSH buckets probe the corpus index, candidates verify
    with exact Jaccard >= 0.5, matched batch docs drop. DuckDB derives
    the identical md5-portable buckets, candidates, and Jaccard —
    whole composition value-checked."""
    docs = T(spark, sf_dir, "documents")
    cut = docs.agg(
        F.floor(F.expr("percentile(doc_id, 0.5)")).cast("long")
    ).collect()[0][0]
    corpus = docs.filter(F.col("doc_id") < cut)
    batch = docs.filter(F.col("doc_id") >= cut)
    kept = dedup.incremental_near_dup(
        batch, corpus, "text", "doc_id",
        threshold=0.5, num_hashes=8, bands=4,
    )
    return kept.select("doc_id", "source").orderBy("doc_id")


SQL_DD_INCREMENTAL_NEAR_DUP = f"""
WITH sig AS ({_minhash_sql(8).replace(" ORDER BY doc_id", "")}),
buckets AS ({_lsh_band_sql(8, 4)}),
cutv AS (SELECT CAST(floor(median(doc_id)) AS BIGINT) AS cut FROM documents),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < (SELECT cut FROM cutv)
    AND b.doc_id >= (SELECT cut FROM cutv)),
{_WORDS_CTE.removeprefix("WITH ")},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
matched AS (
  SELECT DISTINCT i.id_b AS doc_id
  FROM inter i
  JOIN cand c ON c.id_a = i.id_a AND c.id_b = i.id_b
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.i AS DOUBLE)/(sa.n + sb.n - i.i) >= 0.5
)
SELECT d.doc_id, d.source FROM documents d
WHERE d.doc_id >= (SELECT cut FROM cutv)
  AND d.doc_id NOT IN (SELECT doc_id FROM matched)
ORDER BY d.doc_id
"""


def q_profile_table(spark, sf_dir):
    """Dataset profiling op: one-pass column statistics."""
    from dataprocessingframework_spark.operators.profiling import profile_table

    return profile_table(
        T(spark, sf_dir, "documents"), ["lang", "source", "n_chars", "text"]
    )


SQL_PROFILE = """
SELECT COUNT(*) AS n_rows,
  COUNT(lang) AS lang_non_null, COUNT(DISTINCT lang) AS lang_distinct,
  CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS lang_nulls,
  COUNT(source) AS source_non_null, COUNT(DISTINCT source) AS source_distinct,
  CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS source_nulls,
  COUNT(n_chars) AS n_chars_non_null, COUNT(DISTINCT n_chars) AS n_chars_distinct,
  CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_nulls,
  MIN(n_chars) AS n_chars_min, MAX(n_chars) AS n_chars_max,
  ROUND(AVG(n_chars), 4) AS n_chars_avg,
  COUNT(text) AS text_non_null, COUNT(DISTINCT text) AS text_distinct,
  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS text_nulls
FROM documents
"""


def q_dd_lsh_candidates(spark, sf_dir):
    """MinHash-LSH candidate pairs (scale path of near-dup dedup).
    Oracle-checkable because the signatures are md5-portable: DuckDB
    builds the identical band buckets and the identical pair set."""
    return dedup.minhash_lsh_candidates(
        T(spark, sf_dir, "documents"), "text", "doc_id",
        num_hashes=16, bands=4, max_bucket_size=None, bucket_key="md5",
    ).orderBy("id_a", "id_b")


SQL_DD_LSH_CANDIDATES = f"""
WITH sig AS ({_minhash_sql(16).replace(" ORDER BY doc_id", "")}),
buckets AS ({_lsh_band_sql(16, 4)})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM buckets a
JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
              AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
"""


def q_dd_jaccard_lsh(spark, sf_dir):
    """The production near-dup verification composition: LSH candidate
    pairs (sub-quadratic pair space) verified with exact word-set
    Jaccard — the inverted-index join restricted to candidate docs via
    semi-join, candidate set never broadcast (it is unbounded on a
    duplicate-heavy corpus). Full SQL oracle: identical md5-portable
    candidates ∩ identical Jaccard computation."""
    docs = T(spark, sf_dir, "documents")
    cand = dedup.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=8, bands=4, max_bucket_size=None,
        bucket_key="md5",
    )
    return dedup.jaccard_pairs(
        docs, "text", "doc_id", threshold=0.5, candidates=cand
    ).orderBy("id_a", "id_b")


SQL_DD_JACCARD_LSH = f"""
WITH sig AS ({_minhash_sql(8).replace(" ORDER BY doc_id", "")}),
buckets AS ({_lsh_band_sql(8, 4)}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
                AND a.doc_id < b.doc_id),
{_WORDS_CTE.removeprefix("WITH ")},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       ROUND(CAST(i.i AS DOUBLE)/(sa.n + sb.n - i.i), 4) AS jaccard
FROM inter i
JOIN cand c ON c.id_a = i.id_a AND c.id_b = i.id_b
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.i AS DOUBLE)/(sa.n + sb.n - i.i) >= 0.5
ORDER BY i.id_a, i.id_b
"""


# --------------------------------------------------------------------------
# beyond-reference: embedding similarity (north star)
# --------------------------------------------------------------------------


def q_emb_topk(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5
    ).orderBy("q_id", "nbr_id")


SQL_EMB_TOPK = """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS nbr_id,
    list_dot_product(q.v, c.v) /
      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos_raw
  FROM q, c WHERE c.vec_id <> q.vec_id
)
SELECT q_id, nbr_id, ROUND(cos_raw, 4) AS cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, nbr_id) AS rn
  FROM scored
) WHERE rn <= 5 ORDER BY q_id, nbr_id
"""


def q_emb_neardup(spark, sf_dir):
    return similarity.cosine_near_dup_pairs(
        T(spark, sf_dir, "embeddings"), threshold=0.4, exact=True
    ).orderBy("id_a", "id_b")


SQL_EMB_NEARDUP = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_dot_product(a.v, b.v) /
    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) /
  (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
ORDER BY id_a, id_b
"""


def q_emb_label_centroids(spark, sf_dir):
    """Per-label mean embedding in long format — class prototypes for
    centroid-distance pruning and topic balancing."""
    return similarity.label_centroids(T(spark, sf_dir, "embeddings"))


SQL_EMB_LABEL_CENTROIDS = """
WITH ex AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
)
SELECT label, pos, ROUND(AVG(v),4) + 0.0 AS centroid, COUNT(*) AS n_vecs
FROM ex GROUP BY label, pos ORDER BY label, pos
"""


def q_emb_centroid_prune(spark, sf_dir):
    """Centroid-distance outlier pruning — the curation op the class
    prototypes exist for (label_centroids docstring): each vector is
    scored by cosine against its label's mean embedding; vectors below
    the threshold are flagged for removal (mislabeled/noise pruning
    and per-topic corpus cleaning, the embedding-space twin of the
    quality gate).

    Scale shape: centroids come from ONE posexplode aggregate
    (n_labels x dim rows after map-side combine), collapse to
    n_labels arrays, and broadcast onto the corpus; scoring is then a
    narrow codegen projection — the corpus never shuffles. Centroids
    are rounded to 4 dp first so both engines score against identical
    prototypes.
    """
    emb = T(spark, sf_dir, "embeddings")
    cents = (
        similarity.label_centroids(emb)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("centroid")))
                ),
                lambda s: s["centroid"],
            ).alias("cvec")
        )
    )
    cos = F.round(
        similarity.cosine(F.col("embedding"), F.col("cvec")), 4
    )
    return (
        emb.select(
            "vec_id", F.col("label").cast("long").alias("label"), "embedding"
        )
        .join(F.broadcast(cents), "label")
        .select(
            "vec_id",
            "label",
            cos.alias("cos_centroid"),
            (cos >= 0.1).alias("keep"),
        )
        .orderBy("vec_id")
    )


SQL_EMB_CENTROID_PRUNE = """
WITH ex AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
),
cents AS (
  SELECT label, pos, ROUND(AVG(v), 4) AS c FROM ex GROUP BY label, pos
),
carr AS (
  SELECT label, list(c ORDER BY pos) AS cvec FROM cents GROUP BY label
),
e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
)
SELECT e.vec_id, e.label,
       ROUND(list_dot_product(v, cvec) /
             (sqrt(list_dot_product(v, v)) *
              sqrt(list_dot_product(cvec, cvec))), 4) AS cos_centroid,
       ROUND(list_dot_product(v, cvec) /
             (sqrt(list_dot_product(v, v)) *
              sqrt(list_dot_product(cvec, cvec))), 4) >= 0.1 AS keep
FROM e JOIN carr USING (label)
ORDER BY e.vec_id
"""


def q_emb_ann_recall(spark, sf_dir):
    """Self-auditing ANN quality: recall@k of the two approximate
    scale paths (hyperplane-LSH, IVF) against the exact cosine top-k,
    over 50 query vectors. The measure-don't-guess contract, now
    driver-checkable: the EXACT half (pair count + mean exact top-k
    cosine) is SQL-expressible and value-matches the DuckDB
    brute-force oracle, while the approximate recalls — engine- and
    seed-specific by design — collapse to deterministic
    recall>=threshold booleans the oracle pins to TRUE. All set
    arithmetic is distributed: the exact/approx lists semi-join per
    (q_id, nbr_id), only per-query counts aggregate."""
    from dataprocessingframework_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_topk,
        lsh_topk_multi,
    )

    emb = T(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 50)
    k = 10
    exact = cosine_topk(emb, qs, k=k).select("q_id", "nbr_id", "cos")

    def recall_of(approx):
        hits = (
            exact.join(
                approx.select("q_id", "nbr_id"), ["q_id", "nbr_id"], "left_semi"
            )
            .groupBy("q_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        # left-join back onto the full query set: a query with zero
        # hits must count as recall 0, not vanish from the average
        per_q = (
            exact.select("q_id")
            .distinct()
            .join(hits, "q_id", "left")
            .select(F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"))
        )
        return per_q.agg(
            F.round(F.avg(F.col("n_hit") / F.lit(k)), 4)
        ).collect()[0][0]

    n_exact, mean_cos = (
        exact.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("cos"), 4).alias("m"),
        ).collect()[0]
    )
    r_lsh = float(recall_of(lsh_topk(emb, qs, k=k)))
    r_mlsh = float(recall_of(lsh_topk_multi(emb, qs, k=k, n_tables=3)))
    r_ivf = float(recall_of(ivf_topk(emb, qs, k=k, n_cells=16, n_probe=4)))
    return spark.createDataFrame(
        [
            (
                k,
                50,
                int(n_exact),
                float(mean_cos),
                r_lsh >= RECALL_FLOOR_LSH,
                r_mlsh >= RECALL_FLOOR_MLSH,
                # table 0 of the multi path IS the single-table plane
                # set, so the candidate set is a superset — which
                # guarantees recall can only grow or TIE, not strictly
                # grow; pin >= (the property that actually follows)
                # and leave strict improvement to RECALL_FLOOR_MLSH
                r_mlsh >= r_lsh,
                r_ivf >= RECALL_FLOOR_IVF,
            )
        ],
        schema=(
            "k int, n_queries int, n_exact_pairs long, mean_exact_cos double,"
            " recall_lsh_ok boolean, recall_mlsh_ok boolean,"
            " mlsh_ge_lsh boolean, recall_ivf_ok boolean"
        ),
    )


# Deterministic floors: recall depends only on the fixed testdata and
# the seeded hash planes / centroids, so these are stable per sf_dir.
# Measured (sf0.001: lsh 0.098 / ivf 0.55; sf0.01: lsh 0.118 / ivf
# 0.508) and set below the observed minimum with margin. The random
# testdata embeddings are a worst case for hyperplane LSH (no cluster
# structure) — emb_ann_recall exists precisely to surface that
# honestly rather than hide it; pytest separately gates recall gains
# on planted-neighbor data where LSH is designed to shine.
RECALL_FLOOR_LSH = 0.05
# measured L=3 multi-table: 0.278 (sf0.001) / 0.306 (sf0.01)
RECALL_FLOOR_MLSH = 0.2
RECALL_FLOOR_IVF = 0.45

SQL_EMB_ANN_RECALL = """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 50),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS nbr_id,
    list_dot_product(q.v, c.v) /
      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
      AS cos_raw
  FROM q, c WHERE c.vec_id <> q.vec_id
),
topk AS (
  SELECT ROUND(cos_raw, 4) AS cos FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY cos_raw DESC, nbr_id) AS rn
    FROM scored
  ) WHERE rn <= 10
)
SELECT CAST(10 AS INTEGER) AS k, CAST(50 AS INTEGER) AS n_queries,
       COUNT(*) AS n_exact_pairs,
       ROUND(AVG(cos), 4) AS mean_exact_cos,
       TRUE AS recall_lsh_ok, TRUE AS recall_mlsh_ok,
       TRUE AS mlsh_ge_lsh, TRUE AS recall_ivf_ok
FROM topk
"""


def _perturbed_gate_batch(emb, n):
    """Deterministic perturbed near-dup batch for the semantic-gate
    audits: row i (i < 60) becomes v_i + alpha_i * v_{(i+137) % n}
    with alpha_i = 0.1 + (i % 7) * 0.05 — cosines to the source
    vector spread across ~[0.92, 0.996] on random embeddings, i.e.
    straddling the 0.95 gate threshold from BOTH sides, which is
    exactly the regime where false negatives live. Batch ids are
    +10000 so they never collide with corpus ids. Pure double
    arithmetic, bit-reproducible in the DuckDB oracles."""
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    w = v.select(F.col("vec_id").alias("p_id"), F.col("v").alias("wv"))
    # alpha/p_id are materialized BEFORE the self-join: referencing
    # F.col("vec_id") after v.join(w-derived-from-v) hits Spark's
    # self-join lineage ambiguity and silently binds to the PARTNER's
    # pre-alias vec_id (caught by the DuckDB oracle: every batch row
    # got the partner's alpha)
    b0 = v.filter(F.col("vec_id") < 60).select(
        "vec_id",
        "v",
        ((F.col("vec_id") + 137) % F.lit(n)).alias("p_id"),
        (
            F.lit(0.1) + (F.col("vec_id") % 7).cast("double") * F.lit(0.05)
        ).alias("alpha"),
    )
    return b0.join(w, "p_id").select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.zip_with(
            "v", "wv", lambda x, y: x + F.col("alpha") * y
        ).alias("embedding"),
    )


# Shared CTE: the perturbed batch + doubled corpus, mirrored from
# _perturbed_gate_batch (alphas forced to DOUBLE — DuckDB decimal
# literals would diverge from Spark's float64 at the 17th digit).
_GATE_BATCH_CTE = """
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT COUNT(*) AS cnt FROM e),
batch AS (
  SELECT b.vec_id + 10000 AS b_id,
         list_transform(range(1, len(b.v) + 1),
           i -> b.v[i] + (CAST(0.1 AS DOUBLE)
                          + (b.vec_id % 7) * CAST(0.05 AS DOUBLE))
                         * p.wv[i]) AS bv
  FROM e b CROSS JOIN n
  JOIN (SELECT vec_id AS p_id, v AS wv FROM e) p
    ON p.p_id = (b.vec_id + 137) % n.cnt
  WHERE b.vec_id < 60
)"""


def q_emb_gate_recall(spark, sf_dir):
    """Recall audit of the semantic dedup gate — the operator that
    silently DROPS data (similarity.incremental_semantic_dedup), so
    its false-negative rate is the number a user tuning
    n_probe/n_cells must see. 60 planted perturbed near-dups
    (cos to their source in ~[0.92, 0.996], straddling the 0.95
    threshold) are gated against the corpus at n_probe in {1, 2, 4};
    the exact all-pairs max-cosine oracle defines the true-dup set.
    The iters=0 md5-seeded quantizer (same construction as
    stream_semantic_ingest) makes every cell assignment and verdict
    portable arithmetic, so recall itself is FULL-oracled — not a
    pinned >=floor boolean. n_false_drops is structurally 0 (the
    gate only drops on a real >=threshold corpus witness); measured
    recall at sf0.01 feeds the PLANS.md sizing note."""
    from dataprocessingframework_spark.operators.similarity import (
        _ivf_centroids,
        dot,
        incremental_semantic_dedup,
        norm,
    )

    emb = T(spark, sf_dir, "embeddings")
    n = emb.count()
    batch = _perturbed_gate_batch(emb, n).cache()
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    b2 = batch.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("bv")
    )
    c2 = corpus.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv")
    )
    # exact all-pairs witness: 60 x |corpus| — the AUDIT side only;
    # the gate under test never does this
    true_dups = {
        r.b_id
        for r in b2.crossJoin(c2)
        .groupBy("b_id")
        .agg(
            F.max(
                dot(F.col("bv"), F.col("cv"))
                / (norm(F.col("bv")) * norm(F.col("cv")))
            ).alias("mx")
        )
        .filter(F.col("mx") >= 0.95)
        .collect()
    }
    n_batch = batch.count()
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16, iters=0)
    rows = []
    for p in (1, 2, 4):
        kept = {
            r.vec_id
            for r in incremental_semantic_dedup(
                batch, corpus, cents, threshold=0.95, n_probe=p
            )
            .select("vec_id")
            .collect()
        }
        dropped = {
            r.vec_id for r in batch.select("vec_id").collect()
        } - kept
        rows.append(
            (
                p,
                n_batch,
                len(true_dups),
                len(dropped),
                len(dropped - true_dups),
                len(dropped & true_dups) / max(len(true_dups), 1),
            )
        )
    batch.unpersist()
    # round on the Spark side (HALF_UP) — Python round() is
    # half-to-even and diverges from DuckDB ROUND on exact .xxxx5
    # ties (n_true=32 makes 1/32 grid points exactly representable)
    return spark.createDataFrame(
        rows,
        schema=(
            "n_probe int, n_batch long, n_true long, n_dropped long,"
            " n_false_drops long, recall double"
        ),
    ).withColumn("recall", F.round("recall", 4))


SQL_EMB_GATE_RECALL = f"""
WITH {_GATE_BATCH_CTE},
exact AS (
  SELECT b.b_id,
         MAX(list_dot_product(b.bv, e.v) /
             (sqrt(list_dot_product(b.bv, b.bv)) *
              sqrt(list_dot_product(e.v, e.v)))) AS mx
  FROM batch b CROSS JOIN e GROUP BY b.b_id
),
true_dups AS (SELECT b_id FROM exact WHERE mx >= 0.95),
h AS (
  SELECT vec_id, v,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
),
cents AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT v AS cv, hh FROM h ORDER BY hh LIMIT 16)
),
corpus_cells AS (
  SELECT c_id, cvv, cn, cell FROM (
    SELECT e.vec_id AS c_id, e.v AS cvv,
           sqrt(list_dot_product(e.v, e.v)) AS cn, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1 AND cn > 0
),
probes AS (
  SELECT b_id, bv, bn, cell, rn FROM (
    SELECT b.b_id, b.bv, sqrt(list_dot_product(b.bv, b.bv)) AS bn,
           c.cell,
           ROW_NUMBER() OVER (PARTITION BY b.b_id
             ORDER BY list_dot_product(b.bv, c.cv) DESC, c.cell) AS rn
    FROM batch b CROSS JOIN cents c) WHERE rn <= 4 AND bn > 0
),
hitrn AS (
  SELECT p.b_id, MIN(p.rn) AS first_hit_rn
  FROM probes p JOIN corpus_cells c USING (cell)
  WHERE list_dot_product(p.bv, c.cvv) / (p.bn * c.cn) >= 0.95
  GROUP BY p.b_id
)
SELECT CAST(n_probe AS INTEGER) AS n_probe,
  (SELECT COUNT(*) FROM batch) AS n_batch,
  (SELECT COUNT(*) FROM true_dups) AS n_true,
  (SELECT COUNT(*) FROM hitrn WHERE first_hit_rn <= n_probe)
    AS n_dropped,
  (SELECT COUNT(*) FROM hitrn
   WHERE first_hit_rn <= n_probe
     AND b_id NOT IN (SELECT b_id FROM true_dups)) AS n_false_drops,
  ROUND((SELECT COUNT(*) FROM hitrn
         WHERE first_hit_rn <= n_probe
           AND b_id IN (SELECT b_id FROM true_dups)) * 1.0 /
        GREATEST((SELECT COUNT(*) FROM true_dups), 1), 4) AS recall
FROM (SELECT UNNEST([1, 2, 4]) AS n_probe)
ORDER BY n_probe
"""


def q_emb_gate_sq8(spark, sf_dir):
    """The two-stage SQ8-compressed semantic gate end to end (r11):
    the 60-row perturbed near-dup batch (same planted construction
    as emb_gate_recall, straddling the 0.95 threshold) is gated
    against an SQ8-compressed corpus index — stage 1 shortlists
    (b, c) pairs whose code-dequant cosine clears threshold − margin
    (margin DERIVED from the stored bounds and the index's min vnorm
    via the sound 2Δ/min‖v‖ quantization-error bound), stage 2
    fetches only the shortlisted corpus floats and decides on the
    EXACT cosine. Because the derived margin makes stage 1 a
    provable candidate superset and stage 2 is exact, the kept set
    is engine-portable even though two engines evaluate the margin
    with different float rounding — the DuckDB oracle replicates
    bounds → codes → dequant norms → margin → seeded cells →
    shortlist → exact recheck and must match the kept ids exactly."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        _ivf_centroids,
        incremental_semantic_dedup_sq8,
        load_ivf_centroids,
        load_sq8_bounds,
        materialize_ivf_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    n = emb.count()
    batch = _perturbed_gate_batch(emb, n)
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16, iters=0)
    tag = uuid.uuid4().hex[:8]
    table = f"t_gate_sq8_{tag}"
    path = f"/root/repo/.scratch/gate_sq8_{tag}"
    idx, _ = materialize_ivf_index(
        corpus, table, n_cells=16, iters=0, impl="jvm",
        centroids=cents, num_buckets=16, path=path, sq8=True,
    )
    kept = (
        incremental_semantic_dedup_sq8(
            batch,
            corpus,
            load_ivf_centroids(spark, table),
            idx,
            load_sq8_bounds(spark, table),
            threshold=0.95,
            n_probe=2,
        )
        .select("vec_id")
        .orderBy("vec_id")
        .collect()
    )
    for t in (table, f"{table}_centroids", f"{table}_sq8"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for sfx in ("", "_centroids", "_sq8"):
        shutil.rmtree(f"{path}{sfx}", ignore_errors=True)
    return spark.createDataFrame(
        [(r.vec_id,) for r in kept], schema="vec_id long"
    )


# shared CTE body of the SQ8-gate oracle: bounds -> codes ->
# dequant -> margin -> seeded cells -> shortlist (cand) -> exact
# recheck (dropped). Used by both the kept-set oracle
# (emb_gate_sq8) and the telemetry oracle (emb_gate_sq8_stats).
_GATE_SQ8_CTES = """pe AS (SELECT i AS pos, MIN(v[i]) AS mn, MAX(v[i]) AS mx
       FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
       WHERE sqrt(list_dot_product(v, v)) > 0
       GROUP BY i),
bnd AS (SELECT list(mn ORDER BY pos) AS mins,
               list(mx ORDER BY pos) AS maxs FROM pe),
deq AS (
  SELECT vec_id, v,
    list_transform(range(1, 65), i ->
      CASE WHEN maxs[i] > mins[i]
        THEN mins[i]
             + (GREATEST(0, LEAST(255, CAST(FLOOR((v[i] - mins[i])
                      / (maxs[i] - mins[i]) * 256.0) AS BIGINT))) + 0.5)
               * ((maxs[i] - mins[i]) / 256.0)
        ELSE mins[i] END) AS dv
  FROM e CROSS JOIN bnd
),
h AS (
  SELECT vec_id,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
), cents AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT e.v AS cv, hh FROM e JOIN h USING (vec_id)
    ORDER BY hh LIMIT 16)
), corpus_cells AS (
  SELECT c_id, cvv, dvv, dn, cell FROM (
    SELECT d.vec_id AS c_id, d.v AS cvv, d.dv AS dvv,
           sqrt(list_dot_product(d.dv, d.dv)) AS dn, c.cell,
           ROW_NUMBER() OVER (PARTITION BY d.vec_id
             ORDER BY list_dot_product(d.v, c.cv) DESC, c.cell) AS rn
    FROM deq d CROSS JOIN cents c
    WHERE sqrt(list_dot_product(d.v, d.v)) > 0)
  WHERE rn = 1
), margin AS (
  SELECT 2.0 * sqrt(SUM(CASE WHEN mx > mn
                   THEN ((mx - mn) / 256.0 / 2.0)
                        * ((mx - mn) / 256.0 / 2.0)
                   ELSE 0.0 END))
         / (SELECT MIN(dn) FROM corpus_cells WHERE dn > 0) AS m
  FROM pe
), probes AS (
  SELECT b_id, bv, bn, cell FROM (
    SELECT b.b_id, b.bv, sqrt(list_dot_product(b.bv, b.bv)) AS bn,
           c.cell,
           ROW_NUMBER() OVER (PARTITION BY b.b_id
             ORDER BY list_dot_product(b.bv, c.cv) DESC, c.cell) AS rn
    FROM batch b CROSS JOIN cents c
    WHERE sqrt(list_dot_product(b.bv, b.bv)) > 0) WHERE rn <= 2
), cand AS (
  SELECT DISTINCT p.b_id, cc.c_id
  FROM corpus_cells cc JOIN probes p USING (cell) CROSS JOIN margin
  WHERE cc.c_id <> p.b_id
    AND CASE WHEN cc.dn > 0
        THEN list_dot_product(p.bv, cc.dvv) / (p.bn * cc.dn)
             >= 0.95 - margin.m
        ELSE TRUE END
), dropped AS (
  SELECT DISTINCT cand.b_id
  FROM cand
  JOIN e ON e.vec_id = cand.c_id
  JOIN (SELECT b_id, bv FROM batch) b2 ON b2.b_id = cand.b_id
  WHERE sqrt(list_dot_product(e.v, e.v)) > 0
    AND list_dot_product(b2.bv, e.v)
        / (sqrt(list_dot_product(b2.bv, b2.bv))
           * sqrt(list_dot_product(e.v, e.v)))
        >= 0.95
)"""

SQL_EMB_GATE_SQ8 = f"""
WITH {_GATE_BATCH_CTE},
{_GATE_SQ8_CTES}
SELECT b_id AS vec_id FROM batch
WHERE b_id NOT IN (SELECT b_id FROM dropped)
ORDER BY vec_id
"""

# the gate_stats hook, FULL-oracled: on impl='jvm' the stage-1
# shortlist is pure bit-portable arithmetic (unrolled dequant
# fold, derived margin, seeded cells), so its SIZE is
# cross-engine exact, not just the kept set
SQL_EMB_GATE_SQ8_STATS = f"""
WITH {_GATE_BATCH_CTE},
{_GATE_SQ8_CTES}
SELECT
  (SELECT COUNT(*) FROM batch
   WHERE b_id NOT IN (SELECT b_id FROM dropped)) AS kept_rows,
  (SELECT COUNT(*) FROM cand) AS stage1_candidates,
  (SELECT COUNT(DISTINCT c_id) FROM cand) AS distinct_corpus_ids
"""


def q_emb_gate_sq8_stats(spark, sf_dir):
    """The compressed gate's RUNTIME telemetry, driver-checked (r12):
    gate_stats fills stage1_candidates (shortlisted pair count — the
    number whose explosion signals margin collapse) and
    distinct_corpus_ids (float rows stage 2 actually fetches). On
    impl='jvm' the whole stage-1 shortlist is bit-portable
    arithmetic, so the telemetry itself carries a FULL oracle — the
    DuckDB twin replays the identical shortlist and counts it, which
    pins not just the gate's verdicts but its COST model
    cross-engine."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        _ivf_centroids,
        incremental_semantic_dedup_sq8,
        load_ivf_centroids,
        load_sq8_bounds,
        materialize_ivf_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    n = emb.count()
    batch = _perturbed_gate_batch(emb, n)
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16, iters=0)
    tag = uuid.uuid4().hex[:8]
    table = f"t_gate_s8s_{tag}"
    path = f"/root/repo/.scratch/gate_s8s_{tag}"
    idx, _ = materialize_ivf_index(
        corpus, table, n_cells=16, iters=0, impl="jvm",
        centroids=cents, num_buckets=16, path=path, sq8=True,
    )
    st: dict = {}
    kept = incremental_semantic_dedup_sq8(
        batch,
        corpus,
        load_ivf_centroids(spark, table),
        idx,
        load_sq8_bounds(spark, table),
        threshold=0.95,
        n_probe=2,
        gate_stats=st,
    ).count()
    for t in (table, f"{table}_centroids", f"{table}_sq8"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for sfx in ("", "_centroids", "_sq8"):
        shutil.rmtree(f"{path}{sfx}", ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                kept,
                st["stage1_candidates"],
                st["distinct_corpus_ids"],
            )
        ],
        schema=(
            "kept_rows long, stage1_candidates long,"
            " distinct_corpus_ids long"
        ),
    )


def q_emb_gate_prefix(spark, sf_dir):
    """The PREFIX-compressed semantic gate end to end (r13) — the
    training-free rung of the compression ladder: the index stores
    each corpus vector's first 16 of 64 coordinates plus the scalar
    remainder norm, and stage 1 shortlists pairs whose per-pair
    Cauchy-Schwarz bound (<b_p,v_p> + ||b_r||·||v_r||)/(||b||·||v||)
    reaches the 0.95 threshold; stage 2 rechecks exactly. The bound
    can only OVER-estimate the true cosine, so margin=0 is sound and
    the kept set provably equals the exact gate's. The DuckDB oracle
    replicates prefix slices -> remainder norms -> seeded cells ->
    bound shortlist -> exact recheck and must match the kept ids
    exactly."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        _ivf_centroids,
        incremental_semantic_dedup_prefix,
        load_ivf_centroids,
        load_prefix_dims,
        materialize_ivf_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    n = emb.count()
    batch = _perturbed_gate_batch(emb, n)
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16, iters=0)
    tag = uuid.uuid4().hex[:8]
    table = f"t_gate_pfx_{tag}"
    path = f"/root/repo/.scratch/gate_pfx_{tag}"
    idx, _ = materialize_ivf_index(
        corpus, table, n_cells=16, iters=0, impl="jvm",
        centroids=cents, num_buckets=16, path=path, prefix_dims=16,
    )
    dp, _full = load_prefix_dims(spark, table)
    kept = (
        incremental_semantic_dedup_prefix(
            batch,
            corpus,
            load_ivf_centroids(spark, table),
            idx,
            dp,
            threshold=0.95,
            n_probe=2,
        )
        .select("vec_id")
        .orderBy("vec_id")
        .collect()
    )
    for t in (table, f"{table}_centroids", f"{table}_prefix"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for sfx in ("", "_centroids", "_prefix"):
        shutil.rmtree(f"{path}{sfx}", ignore_errors=True)
    return spark.createDataFrame(
        [(r.vec_id,) for r in kept], schema="vec_id long"
    )


# shared CTE body of the prefix-gate oracle: seeded cells ->
# prefix/remainder geometry -> per-pair Cauchy-Schwarz bound
# shortlist (cand) -> exact recheck (dropped). d_p = 16 of 64.
_GATE_PREFIX_CTES = """h AS (
  SELECT vec_id,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
), cents AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT e.v AS cv, hh FROM e JOIN h USING (vec_id)
    ORDER BY hh LIMIT 16)
), corpus_cells AS (
  SELECT c_id, cp, cr, cn, cell FROM (
    SELECT d.vec_id AS c_id, d.v[1:16] AS cp,
           sqrt(list_dot_product(d.v[17:64], d.v[17:64])) AS cr,
           sqrt(list_dot_product(d.v, d.v)) AS cn, c.cell,
           ROW_NUMBER() OVER (PARTITION BY d.vec_id
             ORDER BY list_dot_product(d.v, c.cv) DESC, c.cell) AS rn
    FROM e d CROSS JOIN cents c
    WHERE sqrt(list_dot_product(d.v, d.v)) > 0)
  WHERE rn = 1
), probes AS (
  SELECT b_id, bv, bp, br, bn, cell FROM (
    SELECT b.b_id, b.bv, b.bv[1:16] AS bp,
           sqrt(list_dot_product(b.bv[17:64], b.bv[17:64])) AS br,
           sqrt(list_dot_product(b.bv, b.bv)) AS bn,
           c.cell,
           ROW_NUMBER() OVER (PARTITION BY b.b_id
             ORDER BY list_dot_product(b.bv, c.cv) DESC, c.cell) AS rn
    FROM batch b CROSS JOIN cents c
    WHERE sqrt(list_dot_product(b.bv, b.bv)) > 0) WHERE rn <= 2
), cand AS (
  SELECT DISTINCT p.b_id, cc.c_id
  FROM corpus_cells cc JOIN probes p USING (cell)
  WHERE cc.c_id <> p.b_id
    AND (list_dot_product(p.bp, cc.cp) + p.br * cc.cr)
        / (p.bn * cc.cn) >= 0.95
), dropped AS (
  SELECT DISTINCT cand.b_id
  FROM cand
  JOIN e ON e.vec_id = cand.c_id
  JOIN (SELECT b_id, bv FROM batch) b2 ON b2.b_id = cand.b_id
  WHERE sqrt(list_dot_product(e.v, e.v)) > 0
    AND list_dot_product(b2.bv, e.v)
        / (sqrt(list_dot_product(b2.bv, b2.bv))
           * sqrt(list_dot_product(e.v, e.v)))
        >= 0.95
)"""

SQL_EMB_GATE_PREFIX = f"""
WITH {_GATE_BATCH_CTE},
{_GATE_PREFIX_CTES}
SELECT b_id AS vec_id FROM batch
WHERE b_id NOT IN (SELECT b_id FROM dropped)
ORDER BY vec_id
"""


def q_emb_gate_prefix_report(spark, sf_dir):
    """Sizing report for the prefix rung (r13) — the offline check a
    user runs BEFORE committing to a d_p: the Cauchy-Schwarz bound's
    looseness for a pair is driven by the REST-MASS product
    (||b_r||/||b||)·(||v_r||/||v||), so the corpus rest-mass
    distribution at the candidate d_p predicts shortlist flood
    before any index is built (matryoshka-trained embeddings
    concentrate mass early -> small rest mass -> tight bound; the
    synthetic random testdata is the WORST case, rest mass ~
    sqrt(1 - 16/64), and the report says so honestly). One row:
    rest-mass mean/p95/max at d_p=16 plus the measured gate
    telemetry (kept rows, stage-1 shortlist, distinct fetched ids)
    — all bit-portable arithmetic, FULL oracle."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        _ivf_centroids,
        incremental_semantic_dedup_prefix,
        materialize_ivf_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    n = emb.count()
    batch = _perturbed_gate_batch(emb, n)
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16, iters=0)
    tag = uuid.uuid4().hex[:8]
    table = f"t_gpr_{tag}"
    path = f"/root/repo/.scratch/gate_pfx_rep_{tag}"
    idx, _ = materialize_ivf_index(
        corpus, table, n_cells=16, iters=0, impl="jvm",
        centroids=cents, num_buckets=16, path=path, prefix_dims=16,
    )
    st: dict = {}
    kept = incremental_semantic_dedup_prefix(
        batch, corpus, cents, idx, 16,
        threshold=0.95, n_probe=2, gate_stats=st,
    ).count()
    mass = idx.filter(F.col("vnorm") > 0).select(
        (F.col("rest_norm") / F.col("vnorm")).alias("rm")
    )
    mrow = mass.agg(
        F.round(F.avg("rm"), 4).alias("rest_mass_mean"),
        F.round(F.expr("percentile(rm, 0.95)"), 4).alias("rest_mass_p95"),
        F.round(F.max("rm"), 4).alias("rest_mass_max"),
    ).collect()[0]
    for t in (table, f"{table}_centroids", f"{table}_prefix"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for sfx in ("", "_centroids", "_prefix"):
        shutil.rmtree(f"{path}{sfx}", ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                float(mrow.rest_mass_mean),
                float(mrow.rest_mass_p95),
                float(mrow.rest_mass_max),
                int(kept),
                int(st["stage1_candidates"]),
                int(st["distinct_corpus_ids"]),
            )
        ],
        schema=(
            "rest_mass_mean double, rest_mass_p95 double,"
            " rest_mass_max double, kept_rows long,"
            " stage1_candidates long, distinct_corpus_ids long"
        ),
    )


SQL_EMB_GATE_PREFIX_REPORT = f"""
WITH {_GATE_BATCH_CTE},
{_GATE_PREFIX_CTES},
mass AS (
  SELECT cr / cn AS rm FROM corpus_cells WHERE cn > 0
)
SELECT
  ROUND(AVG(rm), 4) AS rest_mass_mean,
  ROUND(quantile_cont(rm, 0.95), 4) AS rest_mass_p95,
  ROUND(MAX(rm), 4) AS rest_mass_max,
  (SELECT COUNT(*) FROM batch
   WHERE b_id NOT IN (SELECT b_id FROM dropped)) AS kept_rows,
  (SELECT COUNT(*) FROM cand) AS stage1_candidates,
  (SELECT COUNT(DISTINCT c_id) FROM cand) AS distinct_corpus_ids
FROM mass
"""


def q_emb_gate_pq(spark, sf_dir):
    """The two-stage PQ-compressed semantic gate end to end (r11):
    like emb_gate_sq8 but over the 16 B/vector IVF-PQ index, whose
    corpus-wide quantization error is UNBOUNDED — soundness instead
    comes from the PER-ROW margin 2·resid/vnorm, with resid = the
    row's stored reconstruction residual (computed at encode time,
    8 B/row). Stage 1 keeps pairs whose codebook-reconstruction
    cosine clears threshold − that row's margin (a provable
    superset); stage 2 decides on exact cosines, so the kept set is
    engine-portable. The oracle replicates seeded codebooks →
    argmin codes → reconstruction → per-row residuals → per-row
    margins → shortlist → exact recheck."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        _ivf_centroids,
        incremental_semantic_dedup_pq,
        load_ivf_centroids,
        load_pq_codebooks,
        materialize_pq_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    n = emb.count()
    batch = _perturbed_gate_batch(emb, n)
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16, iters=0)
    tag = uuid.uuid4().hex[:8]
    table = f"t_gate_pq_{tag}"
    path = f"/root/repo/.scratch/gate_pq_{tag}"
    idx, _, _ = materialize_pq_index(
        corpus, table, n_cells=16, iters=0, impl="jvm",
        centroids=cents, num_buckets=16, path=path,
    )
    kept = (
        incremental_semantic_dedup_pq(
            batch,
            corpus,
            load_ivf_centroids(spark, table),
            idx,
            load_pq_codebooks(spark, table),
            threshold=0.95,
            n_probe=2,
        )
        .select("vec_id")
        .orderBy("vec_id")
        .collect()
    )
    for t in (table, f"{table}_centroids", f"{table}_pq"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for sfx in ("", "_centroids", "_pq"):
        shutil.rmtree(f"{path}{sfx}", ignore_errors=True)
    return spark.createDataFrame(
        [(r.vec_id,) for r in kept], schema="vec_id long"
    )


SQL_EMB_GATE_PQ = f"""
WITH {_GATE_BATCH_CTE},
h AS (
  SELECT vec_id, v,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
),
cb AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS c FROM (
    SELECT v AS cv, hh FROM h
    WHERE sqrt(list_dot_product(v, v)) > 0
    ORDER BY hh LIMIT 256)
),
dists AS (
  SELECT e.vec_id, sub.s, cb.c,
         list_sum(list_transform(range(1, 9), j ->
           pow(e.v[sub.s * 8 + j] - cb.cv[sub.s * 8 + j], 2))) AS d
  FROM e CROSS JOIN (SELECT unnest(range(0, 8)) AS s) sub CROSS JOIN cb
  WHERE sqrt(list_dot_product(e.v, e.v)) > 0
),
pqc AS (
  SELECT vec_id, s, c FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                 ORDER BY d, c) AS rn
    FROM dists) WHERE rn = 1
),
recon AS (
  SELECT p.vec_id,
         flatten(list(cb.cv[(p.s * 8 + 1):(p.s * 8 + 8)]
                      ORDER BY p.s)) AS rv
  FROM pqc p JOIN cb ON cb.c = p.c GROUP BY p.vec_id
),
cents AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT v AS cv, hh FROM h ORDER BY hh LIMIT 16)
),
corpus_cells AS (
  SELECT c_id, cvv, rv, dn, resid, cell FROM (
    SELECT e.vec_id AS c_id, e.v AS cvv, r.rv,
           sqrt(list_dot_product(r.rv, r.rv)) AS dn,
           sqrt(list_dot_product(
             list_transform(range(1, 65), i -> e.v[i] - r.rv[i]),
             list_transform(range(1, 65), i -> e.v[i] - r.rv[i])))
             AS resid,
           c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
    FROM e JOIN recon r USING (vec_id) CROSS JOIN cents c)
  WHERE rn = 1
),
probes AS (
  SELECT b_id, bv, bn, cell FROM (
    SELECT b.b_id, b.bv, sqrt(list_dot_product(b.bv, b.bv)) AS bn,
           c.cell,
           ROW_NUMBER() OVER (PARTITION BY b.b_id
             ORDER BY list_dot_product(b.bv, c.cv) DESC, c.cell) AS rn
    FROM batch b CROSS JOIN cents c
    WHERE sqrt(list_dot_product(b.bv, b.bv)) > 0) WHERE rn <= 2
),
cand AS (
  SELECT DISTINCT p.b_id, cc.c_id
  FROM corpus_cells cc JOIN probes p USING (cell)
  WHERE cc.c_id <> p.b_id
    AND CASE WHEN cc.dn > 0
        THEN list_dot_product(p.bv, cc.rv) / (p.bn * cc.dn)
             >= 0.95 - 2.0 * cc.resid / cc.dn
        ELSE TRUE END
),
dropped AS (
  SELECT DISTINCT cand.b_id
  FROM cand
  JOIN e ON e.vec_id = cand.c_id
  JOIN (SELECT b_id, bv FROM batch) b2 ON b2.b_id = cand.b_id
  WHERE sqrt(list_dot_product(e.v, e.v)) > 0
    AND list_dot_product(b2.bv, e.v)
        / (sqrt(list_dot_product(b2.bv, b2.bv))
           * sqrt(list_dot_product(e.v, e.v)))
        >= 0.95
)
SELECT b_id AS vec_id FROM batch
WHERE b_id NOT IN (SELECT b_id FROM dropped)
ORDER BY vec_id
"""


def q_emb_gate_margin_report(spark, sf_dir):
    """Sizing report for the SQ8 compressed gate (r11) — the numbers
    a user reads BEFORE switching the gate to the compressed index:
    the quantization error radius Δ = sqrt(Σ(stepᵢ/2)²), the
    corpus min/mean stored vnorm, the derived sound margin
    2Δ/min‖v‖, and how much stage-1 headroom that leaves at the
    default 0.95 threshold (threshold − margin). All pure floor/
    bounds arithmetic over the seeded index, so the one-row report
    is FULL-oracled; a margin that eats the whole threshold tells
    the user their embedding scale is too small for SQ8 gating and
    to renormalize or stay on the float gate."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        SQ8_LEVELS,
        _ivf_centroids,
        materialize_ivf_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16, iters=0)
    tag = uuid.uuid4().hex[:8]
    table = f"t_gate_mr_{tag}"
    path = f"/root/repo/.scratch/gate_mr_{tag}"
    idx, _ = materialize_ivf_index(
        corpus, table, n_cells=16, iters=0, impl="jvm",
        centroids=cents, num_buckets=16, path=path, sq8=True,
    )
    bounds = spark.table(f"{table}_sq8").select(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    "mins",
                    "maxs",
                    lambda mn, mx: F.when(
                        mx > mn,
                        ((mx - mn) / F.lit(float(SQ8_LEVELS)) / F.lit(2.0))
                        * ((mx - mn) / F.lit(float(SQ8_LEVELS)) / F.lit(2.0)),
                    ).otherwise(F.lit(0.0)),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("delta")
    )
    stats = idx.filter(F.col("vnorm") > 0).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("vnorm").alias("min_vnorm"),
        F.avg("vnorm").alias("mean_vnorm"),
    )
    out = (
        stats.crossJoin(bounds)
        .select(
            "n_rows",
            F.round("delta", 4).alias("delta"),
            F.round("min_vnorm", 4).alias("min_vnorm"),
            F.round("mean_vnorm", 4).alias("mean_vnorm"),
            F.round(
                F.lit(2.0) * F.col("delta") / F.col("min_vnorm"), 4
            ).alias("margin"),
            F.round(
                F.lit(0.95)
                - F.lit(2.0) * F.col("delta") / F.col("min_vnorm"),
                4,
            ).alias("stage1_threshold"),
        )
        .collect()
    )
    for t in (table, f"{table}_centroids", f"{table}_sq8"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for sfx in ("", "_centroids", "_sq8"):
        shutil.rmtree(f"{path}{sfx}", ignore_errors=True)
    return spark.createDataFrame(
        out,
        schema=(
            "n_rows long, delta double, min_vnorm double,"
            " mean_vnorm double, margin double,"
            " stage1_threshold double"
        ),
    )


SQL_EMB_GATE_MARGIN_REPORT = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pe AS (SELECT i AS pos, MIN(v[i]) AS mn, MAX(v[i]) AS mx
       FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
       WHERE sqrt(list_dot_product(v, v)) > 0
       GROUP BY i),
b AS (SELECT list(mn ORDER BY pos) AS mins,
             list(mx ORDER BY pos) AS maxs FROM pe),
delta AS (
  SELECT sqrt(SUM(CASE WHEN mx > mn
                  THEN ((mx - mn) / 256.0 / 2.0)
                       * ((mx - mn) / 256.0 / 2.0)
                  ELSE 0.0 END)) AS delta
  FROM pe
),
deq AS (
  SELECT vec_id,
    list_transform(range(1, 65), i ->
      CASE WHEN maxs[i] > mins[i]
        THEN mins[i]
             + (GREATEST(0, LEAST(255, CAST(FLOOR((v[i] - mins[i])
                      / (maxs[i] - mins[i]) * 256.0) AS BIGINT))) + 0.5)
               * ((maxs[i] - mins[i]) / 256.0)
        ELSE mins[i] END) AS dv
  FROM e CROSS JOIN b
  WHERE sqrt(list_dot_product(v, v)) > 0
),
norms AS (
  SELECT sqrt(list_dot_product(dv, dv)) AS dn FROM deq
),
stats AS (
  SELECT COUNT(*) AS n_rows, MIN(dn) AS min_vnorm,
         AVG(dn) AS mean_vnorm
  FROM norms WHERE dn > 0
)
SELECT n_rows,
       ROUND(delta, 4) AS delta,
       ROUND(min_vnorm, 4) AS min_vnorm,
       ROUND(mean_vnorm, 4) AS mean_vnorm,
       ROUND(2.0 * delta / min_vnorm, 4) AS margin,
       ROUND(0.95 - 2.0 * delta / min_vnorm, 4) AS stage1_threshold
FROM stats CROSS JOIN delta
"""


def q_emb_gate_pq_margin_report(spark, sf_dir):
    """Sizing report for the PQ compressed gate (r12 — VERDICT r11
    item 2): the SQ8 report's twin for the 16 B rung, where the
    stage-1 margin is PER-ROW (2·resid/‖v̂‖ from the stored
    reconstruction residuals) and collapses when the codebooks
    reconstruct the corpus poorly — the exact regime a user must
    detect BEFORE switching a production gate to PQ. Builds the
    seeded oracle-portable IVF-PQ index and reads
    ``pq_gate_margin_report``'s one-row aggregate: residual
    distribution, reconstruction norms, per-row margin distribution,
    and the fraction of corpus rows with NO stage-1 pruning power at
    threshold 0.95 (degenerate or margin >= threshold). All pure
    arithmetic over the index's resid/vnorm columns, so FULL-oracled:
    the oracle replays seeded codebooks → argmin codes →
    reconstruction → residuals → the same percentile arithmetic."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        _ivf_centroids,
        materialize_pq_index,
        pq_gate_margin_report,
    )

    emb = T(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16, iters=0)
    tag = uuid.uuid4().hex[:8]
    table = f"t_gate_pqmr_{tag}"
    path = f"/root/repo/.scratch/gate_pqmr_{tag}"
    idx, _, _ = materialize_pq_index(
        corpus, table, n_cells=16, iters=0, impl="jvm",
        centroids=cents, num_buckets=16, path=path,
    )
    out = pq_gate_margin_report(idx, threshold=0.95).collect()
    for t in (table, f"{table}_centroids", f"{table}_pq"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for sfx in ("", "_centroids", "_pq"):
        shutil.rmtree(f"{path}{sfx}", ignore_errors=True)
    return spark.createDataFrame(
        out,
        schema=(
            "n_rows long, n_degenerate long, resid_p50 double,"
            " resid_p95 double, resid_max double, min_vnorm double,"
            " mean_vnorm double, margin_p50 double, margin_p95 double,"
            " margin_max double, frac_no_headroom double"
        ),
    )


# Replays the PQ encode (seeded codebooks -> argmin codes ->
# reconstruction -> per-row residuals, identical CTEs to
# SQL_EMB_GATE_PQ) and aggregates the same one-row report;
# quantile_cont matches Spark's exact percentile (both linear
# interpolation at rank p*(n-1)).
SQL_EMB_GATE_PQ_MARGIN_REPORT = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
h AS (
  SELECT vec_id, v,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
),
cb AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS c FROM (
    SELECT v AS cv, hh FROM h
    WHERE sqrt(list_dot_product(v, v)) > 0
    ORDER BY hh LIMIT 256)
),
dists AS (
  SELECT e.vec_id, sub.s, cb.c,
         list_sum(list_transform(range(1, 9), j ->
           pow(e.v[sub.s * 8 + j] - cb.cv[sub.s * 8 + j], 2))) AS d
  FROM e CROSS JOIN (SELECT unnest(range(0, 8)) AS s) sub CROSS JOIN cb
  WHERE sqrt(list_dot_product(e.v, e.v)) > 0
),
pqc AS (
  SELECT vec_id, s, c FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                 ORDER BY d, c) AS rn
    FROM dists) WHERE rn = 1
),
recon AS (
  SELECT p.vec_id,
         flatten(list(cb.cv[(p.s * 8 + 1):(p.s * 8 + 8)]
                      ORDER BY p.s)) AS rv
  FROM pqc p JOIN cb ON cb.c = p.c GROUP BY p.vec_id
),
rows_ AS (
  SELECT sqrt(list_dot_product(r.rv, r.rv)) AS dn,
         sqrt(list_dot_product(
           list_transform(range(1, 65), i -> e.v[i] - r.rv[i]),
           list_transform(range(1, 65), i -> e.v[i] - r.rv[i])))
           AS resid
  FROM e JOIN recon r USING (vec_id)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN dn <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_degenerate,
       ROUND(quantile_cont(resid, 0.5), 4) AS resid_p50,
       ROUND(quantile_cont(resid, 0.95), 4) AS resid_p95,
       ROUND(MAX(resid), 4) AS resid_max,
       ROUND(MIN(dn) FILTER (WHERE dn > 0), 4) AS min_vnorm,
       ROUND(AVG(dn) FILTER (WHERE dn > 0), 4) AS mean_vnorm,
       ROUND(quantile_cont(2.0 * resid / dn, 0.5)
             FILTER (WHERE dn > 0), 4) AS margin_p50,
       ROUND(quantile_cont(2.0 * resid / dn, 0.95)
             FILTER (WHERE dn > 0), 4) AS margin_p95,
       ROUND(MAX(2.0 * resid / dn) FILTER (WHERE dn > 0), 4)
         AS margin_max,
       ROUND(SUM(CASE WHEN dn <= 0 THEN 1
                      WHEN 2.0 * resid / dn >= 0.95 THEN 1
                      ELSE 0 END) * 1.0 / COUNT(*), 4)
         AS frac_no_headroom
FROM rows_
"""


def q_emb_gate_blas_parity(spark, sf_dir):
    """Driver-checks the blas PRODUCTION path of the semantic gate
    (streaming.incremental_semantic_ingest defaults impl='blas')
    including the r9 max_cell_rows salting: with n_probe == n_cells
    every batch row probes every cell, so the gate is EXACT — drop
    iff ANY different-id corpus cosine >= threshold — and the oracle
    is a plain NOT EXISTS, no quantizer arithmetic at all. The gate
    runs twice, impl='jvm' and impl='blas' with max_cell_rows=50
    (500-row corpus / 8 cells, so every real cell salts into
    sub-blocks), and the full-outer join of the two kept sets must
    collapse to identical TRUE/TRUE rows the oracle reproduces —
    any impl divergence or salting bug surfaces as a hash
    mismatch."""
    from dataprocessingframework_spark.operators.similarity import (
        _ivf_centroids,
        incremental_semantic_dedup,
    )

    emb = T(spark, sf_dir, "embeddings")
    n = emb.count()
    batch = _perturbed_gate_batch(emb, n).cache()
    batch.count()
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 8, iters=0)
    kept_j = incremental_semantic_dedup(
        batch, corpus, cents, threshold=0.95, n_probe=8, impl="jvm"
    ).select("vec_id")
    kept_b = incremental_semantic_dedup(
        batch, corpus, cents, threshold=0.95, n_probe=8, impl="blas",
        max_cell_rows=50,
    ).select("vec_id")
    out = (
        kept_j.withColumn("in_jvm", F.lit(True))
        .join(
            kept_b.withColumn("in_blas", F.lit(True)),
            "vec_id",
            "full_outer",
        )
        .select(
            "vec_id",
            F.coalesce("in_jvm", F.lit(False)).alias("in_jvm"),
            F.coalesce("in_blas", F.lit(False)).alias("in_blas"),
        )
        .orderBy("vec_id")
    )
    res = spark.createDataFrame(out.collect(), out.schema)
    batch.unpersist()
    return res


SQL_EMB_GATE_BLAS_PARITY = f"""
WITH {_GATE_BATCH_CTE}
SELECT b.b_id AS vec_id, TRUE AS in_jvm, TRUE AS in_blas
FROM batch b
WHERE NOT EXISTS (
  SELECT 1 FROM e
  WHERE list_dot_product(e.v, e.v) > 0
    AND list_dot_product(b.bv, e.v) /
        (sqrt(list_dot_product(b.bv, b.bv)) *
         sqrt(list_dot_product(e.v, e.v))) >= 0.95
)
ORDER BY vec_id
"""


def q_emb_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN (scale path). Approximate vs exact top-k by
    design, but fully DETERMINISTIC — the hyperplanes are md5-derived
    (similarity._hyperplanes), so the whole pipeline (sign-pattern
    buckets, multi-probe radius 1, cosine scoring, k=5 ranking) is
    replicated in the DuckDB oracle below: a FULL cross-engine check,
    not rows-only. The oracle recomputes the planes from the same
    md5 formula rather than pasting float literals."""
    emb = T(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, broadcast_queries=True
    ).orderBy("q_id", "nbr_id")


SQL_EMB_LSH_TOPK = """
WITH pl AS (
  SELECT p, list_transform(range(0, 64), d ->
      (CAST(concat('0x', substr(md5('plane:' || p || ':' || d), 1, 15))
            AS BIGINT) % 2000001) / 1000000.0 - 1.0) AS v
  FROM range(0, 8) t(p)
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
bucketed AS (
  SELECT e.vec_id, e.v,
         CAST(SUM(CASE WHEN list_dot_product(e.v, pl.v) >= 0
                       THEN 1 << pl.p ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN pl GROUP BY e.vec_id, e.v
),
q AS (SELECT vec_id AS q_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn,
             bucket
      FROM bucketed WHERE vec_id < 5),
probes AS (
  SELECT q_id, qv, qn, xor(bucket, m.mask) AS bucket
  FROM q CROSS JOIN (
    SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS mask) m
),
c AS (SELECT vec_id AS nbr_id, v AS cv, sqrt(list_dot_product(v, v)) AS cn,
             bucket
      FROM bucketed),
scored AS (
  SELECT q_id, nbr_id, list_dot_product(qv, cv) / (qn * cn) AS cos_raw
  FROM c JOIN probes USING (bucket)
  WHERE nbr_id <> q_id
)
SELECT q_id, nbr_id, ROUND(cos_raw, 4) AS cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, nbr_id) AS rn
  FROM scored) WHERE rn <= 5
ORDER BY q_id, nbr_id
"""


def q_emb_lsh_multi_topk(spark, sf_dir):
    """Multi-table hyperplane LSH ANN (L=3 independent plane sets,
    OR-amplification): the production recall knob over emb_lsh_topk —
    measured recall@10 on this corpus 0.306 vs 0.118 single-table.
    Like emb_lsh_topk, every plane is md5-derived, so the DuckDB
    oracle recomputes all three tables from the same hash chain and
    the check is FULL (values, not rows-only)."""
    emb = T(spark, sf_dir, "embeddings")
    return similarity.lsh_topk_multi(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=5,
        n_tables=3,
        broadcast_queries=True,
    ).orderBy("q_id", "nbr_id")


SQL_EMB_LSH_MULTI_TOPK = """
WITH pl AS (
  SELECT t, p, list_transform(range(0, 64), d ->
      (CAST(concat('0x', substr(md5(
          CASE WHEN t = 0 THEN 'plane:' || p || ':' || d
               ELSE 'plane:' || t || ':' || p || ':' || d END), 1, 15))
            AS BIGINT) % 2000001) / 1000000.0 - 1.0) AS v
  FROM range(0, 3) tt(t) CROSS JOIN range(0, 8) pp(p)
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
bucketed AS (
  SELECT e.vec_id, e.v, pl.t,
         CAST(SUM(CASE WHEN list_dot_product(e.v, pl.v) >= 0
                       THEN 1 << pl.p ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN pl GROUP BY e.vec_id, e.v, pl.t
),
q AS (SELECT vec_id AS q_id, v AS qv, t, bucket
      FROM bucketed WHERE vec_id < 5),
probes AS (
  SELECT q_id, t, xor(bucket, m.mask) AS bucket
  FROM q CROSS JOIN (
    SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS mask) m
),
c AS (SELECT vec_id AS nbr_id, t, bucket FROM bucketed),
cand AS (
  SELECT DISTINCT q_id, nbr_id
  FROM c JOIN probes USING (t, bucket)
  WHERE nbr_id <> q_id
),
scored AS (
  SELECT cand.q_id, cand.nbr_id,
         list_dot_product(qe.v, ce.v) /
           (sqrt(list_dot_product(qe.v, qe.v)) *
            sqrt(list_dot_product(ce.v, ce.v))) AS cos_raw
  FROM cand
  JOIN e qe ON qe.vec_id = cand.q_id
  JOIN e ce ON ce.vec_id = cand.nbr_id
)
SELECT q_id, nbr_id, ROUND(cos_raw, 4) AS cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, nbr_id) AS rn
  FROM scored) WHERE rn <= 5
ORDER BY q_id, nbr_id
"""


def q_emb_lsh_index_topk(spark, sf_dir):
    """The index-probe ANN path end to end: materialize the
    (tbl, bucket)-bucketed multi-table index, probe it, drop the
    scratch table. Output is definitionally identical to
    emb_lsh_multi_topk (same planes, same scoring), so it shares that
    oracle — a FULL driver check that the materialized-index route
    loses nothing vs the inline route."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        lsh_topk_from_index,
        materialize_lsh_ann_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    tag = uuid.uuid4().hex[:8]
    table = f"t_ann_idx_{tag}"
    path = f"/root/repo/.scratch/ann_idx_{tag}"
    idx = materialize_lsh_ann_index(
        emb, table, num_buckets=8, path=path
    )
    out = (
        lsh_topk_from_index(
            idx,
            emb.filter(F.col("vec_id") < 5),
            k=5,
            n_tables=3,
            broadcast_queries=True,
        )
        .orderBy("q_id", "nbr_id")
        .collect()
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        out, schema="q_id long, nbr_id long, cos double"
    )


def q_emb_ivf_index_topk(spark, sf_dir):
    """The IVF index-probe ANN path end to end: train the seeded
    (iters=0) coarse quantizer, materialize the cell-bucketed
    inverted lists + persisted centroids, reload the quantizer, probe
    the index, drop the scratch tables. Output is definitionally
    identical to emb_ivf_topk_seeded (same centroids, same n_probe,
    same scoring), so it shares that FULL oracle — the driver check
    that the materialized-index route loses nothing vs the inline
    route. Probe-cell pushdown is forced ON so the driver exercises
    the bucket-pruned scan shape (results are pinned identical
    on/off by tests/test_bucketed.py)."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        ivf_topk_from_index,
        load_ivf_centroids,
        materialize_ivf_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    tag = uuid.uuid4().hex[:8]
    table = f"t_ivf_idx_{tag}"
    path = f"/root/repo/.scratch/ivf_idx_{tag}"
    idx, _ = materialize_ivf_index(
        emb, table, n_cells=16, iters=0, impl="jvm",
        num_buckets=16, path=path,
    )
    out = (
        ivf_topk_from_index(
            idx,
            load_ivf_centroids(spark, table),
            emb.filter(F.col("vec_id") < 5),
            k=5,
            n_probe=4,
            impl="jvm",
            pushdown_probe_cells=True,
        )
        .orderBy("q_id", "nbr_id")
        .collect()
    )
    for t in (table, f"{table}_centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(f"{path}_centroids", ignore_errors=True)
    return spark.createDataFrame(
        out, schema="q_id long, nbr_id long, cos double"
    )


def q_emb_ivf_sq8_topk(spark, sf_dir):
    """The SQ8-compressed IVF index probe end to end (r10): build the
    cell-bucketed index with sq8=True (codes packed 7-per-bigint,
    ~3.6x smaller stored payload — at 100 TB the index IS the scan
    cost), reload quantizer + bounds, probe, drop scratch tables.
    Every step is floor/shift arithmetic — bit-portable — so the
    DuckDB oracle replicates bounds -> codes -> midpoint dequant ->
    dequant norms -> seeded cells -> probe -> top-k and the result
    value-hashes across engines; a pack/unpack bug anywhere would
    shift the cosines and fail the hash."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        ivf_topk_from_index,
        load_ivf_centroids,
        load_sq8_bounds,
        materialize_ivf_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    tag = uuid.uuid4().hex[:8]
    table = f"t_sq8_idx_{tag}"
    path = f"/root/repo/.scratch/sq8_idx_{tag}"
    idx, _ = materialize_ivf_index(
        emb, table, n_cells=16, iters=0, impl="jvm",
        num_buckets=16, path=path, sq8=True,
    )
    out = (
        ivf_topk_from_index(
            idx,
            load_ivf_centroids(spark, table),
            emb.filter(F.col("vec_id") < 5),
            k=5,
            n_probe=4,
            impl="jvm",
            sq8_bounds=load_sq8_bounds(spark, table),
        )
        .orderBy("q_id", "nbr_id")
        .collect()
    )
    for t in (table, f"{table}_centroids", f"{table}_sq8"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for sfx in ("", "_centroids", "_sq8"):
        shutil.rmtree(f"{path}{sfx}", ignore_errors=True)
    return spark.createDataFrame(
        out, schema="q_id long, nbr_id long, cos double"
    )


SQL_EMB_IVF_SQ8_TOPK = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pe AS (SELECT i AS pos, MIN(v[i]) AS mn, MAX(v[i]) AS mx
       FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
       WHERE sqrt(list_dot_product(v, v)) > 0
       GROUP BY i),
b AS (SELECT list(mn ORDER BY pos) AS mins,
             list(mx ORDER BY pos) AS maxs FROM pe),
deq AS (
  SELECT vec_id, v,
    list_transform(range(1, 65), i ->
      CASE WHEN maxs[i] > mins[i]
        THEN mins[i]
             + (GREATEST(0, LEAST(255, CAST(FLOOR((v[i] - mins[i])
                      / (maxs[i] - mins[i]) * 256.0) AS BIGINT))) + 0.5)
               * ((maxs[i] - mins[i]) / 256.0)
        ELSE mins[i] END) AS dv
  FROM e CROSS JOIN b
),
h AS (
  SELECT vec_id,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
), cents AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT e.v AS cv, hh FROM e JOIN h USING (vec_id)
    ORDER BY hh LIMIT 16)
), corpus_cells AS (
  SELECT nbr_id, dvv, dn, cell FROM (
    SELECT d.vec_id AS nbr_id, d.dv AS dvv,
           sqrt(list_dot_product(d.dv, d.dv)) AS dn, c.cell,
           ROW_NUMBER() OVER (PARTITION BY d.vec_id
             ORDER BY list_dot_product(d.v, c.cv) DESC, c.cell) AS rn
    FROM deq d CROSS JOIN cents c
    WHERE sqrt(list_dot_product(d.v, d.v)) > 0)
  WHERE rn = 1 AND dn > 0
), probes AS (
  SELECT q_id, qv, cell FROM (
    SELECT e.vec_id AS q_id, e.v AS qv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
    FROM e CROSS JOIN cents c WHERE e.vec_id < 5) WHERE rn <= 4
), scored AS (
  SELECT q_id, nbr_id,
         list_dot_product(qv, dvv) /
           (sqrt(list_dot_product(qv, qv)) * dn) AS cos_raw
  FROM corpus_cells JOIN probes USING (cell)
  WHERE nbr_id <> q_id
)
SELECT q_id, nbr_id, ROUND(cos_raw, 4) AS cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, nbr_id) AS rn
  FROM scored) WHERE rn <= 5
ORDER BY q_id, nbr_id
"""


def q_emb_ivf_pq_topk(spark, sf_dir):
    """The IVF-PQ index probe end to end (r10): build the
    cell-bucketed index with m=8 product-quantization codes per
    vector (16 B payload vs 256 B float32 — the Jegou-et-al
    billion-scale layout), reload quantizer + codebooks, probe,
    drop scratch tables. Seeded (no-Lloyd) codebooks make code
    assignment portable argmin arithmetic, so the oracle replicates
    codebooks -> per-subspace argmin codes -> reconstruction ->
    reconstruction norms -> seeded cells -> asymmetric scoring ->
    top-k, and any packing/lookup bug shifts the cosines and fails
    the value hash."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        ivf_pq_topk_from_index,
        load_ivf_centroids,
        load_pq_codebooks,
        materialize_pq_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    tag = uuid.uuid4().hex[:8]
    table = f"t_pq_idx_{tag}"
    path = f"/root/repo/.scratch/pq_idx_{tag}"
    idx, _, _ = materialize_pq_index(
        emb, table, n_cells=16, iters=0, impl="jvm",
        num_buckets=16, path=path,
    )
    out = (
        ivf_pq_topk_from_index(
            idx,
            load_ivf_centroids(spark, table),
            load_pq_codebooks(spark, table),
            emb.filter(F.col("vec_id") < 5),
            k=5,
            n_probe=4,
            impl="jvm",
        )
        .orderBy("q_id", "nbr_id")
        .collect()
    )
    for t in (table, f"{table}_centroids", f"{table}_pq"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for sfx in ("", "_centroids", "_pq"):
        shutil.rmtree(f"{path}{sfx}", ignore_errors=True)
    return spark.createDataFrame(
        out, schema="q_id long, nbr_id long, cos double"
    )


SQL_EMB_IVF_PQ_TOPK = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
h AS (
  SELECT vec_id, v,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
),
cb AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS c FROM (
    SELECT v AS cv, hh FROM h
    WHERE sqrt(list_dot_product(v, v)) > 0
    ORDER BY hh LIMIT 256)
),
dists AS (
  SELECT e.vec_id, sub.s, cb.c,
         list_sum(list_transform(range(1, 9), j ->
           pow(e.v[sub.s * 8 + j] - cb.cv[sub.s * 8 + j], 2))) AS d
  FROM e CROSS JOIN (SELECT unnest(range(0, 8)) AS s) sub CROSS JOIN cb
  WHERE sqrt(list_dot_product(e.v, e.v)) > 0
),
pqc AS (
  SELECT vec_id, s, c FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                 ORDER BY d, c) AS rn
    FROM dists) WHERE rn = 1
),
recon AS (
  SELECT p.vec_id,
         flatten(list(cb.cv[(p.s * 8 + 1):(p.s * 8 + 8)]
                      ORDER BY p.s)) AS rv
  FROM pqc p JOIN cb ON cb.c = p.c GROUP BY p.vec_id
),
cents AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT v AS cv, hh FROM h ORDER BY hh LIMIT 16)
),
corpus_cells AS (
  SELECT nbr_id, rv, dn, cell FROM (
    SELECT e.vec_id AS nbr_id, r.rv,
           sqrt(list_dot_product(r.rv, r.rv)) AS dn, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
    FROM e JOIN recon r USING (vec_id) CROSS JOIN cents c)
  WHERE rn = 1 AND dn > 0
),
probes AS (
  SELECT q_id, qv, cell FROM (
    SELECT e.vec_id AS q_id, e.v AS qv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
    FROM e CROSS JOIN cents c WHERE e.vec_id < 5) WHERE rn <= 4
),
scored AS (
  SELECT q_id, nbr_id,
         list_dot_product(qv, rv) /
           (sqrt(list_dot_product(qv, qv)) * dn) AS cos_raw
  FROM corpus_cells JOIN probes USING (cell)
  WHERE nbr_id <> q_id
)
SELECT q_id, nbr_id, ROUND(cos_raw, 4) AS cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, nbr_id) AS rn
  FROM scored) WHERE rn <= 5
ORDER BY q_id, nbr_id
"""


def q_emb_ivf_pq_rerank(spark, sf_dir):
    """Two-stage IVF-PQ serving under the oracle (r10): the
    compressed index shortlists 20 candidates per query, then only
    those candidates' ORIGINAL vectors are exactly re-ranked to
    top-5 — the FAISS production recipe, where compression costs
    shortlist coverage but never ranking quality. The oracle
    replicates shortlist arithmetic (seeded codebooks + argmin
    codes + reconstruction scoring) and the exact re-rank."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        ivf_pq_topk_rerank,
        load_ivf_centroids,
        load_pq_codebooks,
        materialize_pq_index,
    )

    emb = T(spark, sf_dir, "embeddings")
    tag = uuid.uuid4().hex[:8]
    table = f"t_pqr_idx_{tag}"
    path = f"/root/repo/.scratch/pqr_idx_{tag}"
    idx, _, _ = materialize_pq_index(
        emb, table, n_cells=16, iters=0, impl="jvm",
        num_buckets=16, path=path,
    )
    out = (
        ivf_pq_topk_rerank(
            idx,
            load_ivf_centroids(spark, table),
            load_pq_codebooks(spark, table),
            emb.filter(F.col("vec_id") < 5),
            emb,
            k=5,
            shortlist=20,
            n_probe=4,
            impl="jvm",
        )
        .orderBy("q_id", "nbr_id")
        .collect()
    )
    for t in (table, f"{table}_centroids", f"{table}_pq"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for sfx in ("", "_centroids", "_pq"):
        shutil.rmtree(f"{path}{sfx}", ignore_errors=True)
    return spark.createDataFrame(
        out, schema="q_id long, nbr_id long, cos double"
    )


SQL_EMB_IVF_PQ_RERANK = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
h AS (
  SELECT vec_id, v,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
),
cb AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS c FROM (
    SELECT v AS cv, hh FROM h
    WHERE sqrt(list_dot_product(v, v)) > 0
    ORDER BY hh LIMIT 256)
),
dists AS (
  SELECT e.vec_id, sub.s, cb.c,
         list_sum(list_transform(range(1, 9), j ->
           pow(e.v[sub.s * 8 + j] - cb.cv[sub.s * 8 + j], 2))) AS d
  FROM e CROSS JOIN (SELECT unnest(range(0, 8)) AS s) sub CROSS JOIN cb
  WHERE sqrt(list_dot_product(e.v, e.v)) > 0
),
pqc AS (
  SELECT vec_id, s, c FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                 ORDER BY d, c) AS rn
    FROM dists) WHERE rn = 1
),
recon AS (
  SELECT p.vec_id,
         flatten(list(cb.cv[(p.s * 8 + 1):(p.s * 8 + 8)]
                      ORDER BY p.s)) AS rv
  FROM pqc p JOIN cb ON cb.c = p.c GROUP BY p.vec_id
),
cents AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT v AS cv, hh FROM h ORDER BY hh LIMIT 16)
),
corpus_cells AS (
  SELECT nbr_id, rv, dn, cell FROM (
    SELECT e.vec_id AS nbr_id, r.rv,
           sqrt(list_dot_product(r.rv, r.rv)) AS dn, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
    FROM e JOIN recon r USING (vec_id) CROSS JOIN cents c)
  WHERE rn = 1 AND dn > 0
),
probes AS (
  SELECT q_id, qv, cell FROM (
    SELECT e.vec_id AS q_id, e.v AS qv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
    FROM e CROSS JOIN cents c WHERE e.vec_id < 5) WHERE rn <= 4
),
short AS (
  SELECT q_id, nbr_id FROM (
    SELECT q_id, nbr_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
             list_dot_product(qv, rv) /
               (sqrt(list_dot_product(qv, qv)) * dn) DESC,
             nbr_id) AS rn
    FROM corpus_cells JOIN probes USING (cell)
    WHERE nbr_id <> q_id) WHERE rn <= 20
),
rerank AS (
  SELECT s.q_id, s.nbr_id,
         list_dot_product(q.v, c.v) /
           (sqrt(list_dot_product(q.v, q.v))
            * sqrt(list_dot_product(c.v, c.v))) AS cos_raw
  FROM short s
  JOIN e q ON q.vec_id = s.q_id
  JOIN e c ON c.vec_id = s.nbr_id
  WHERE sqrt(list_dot_product(c.v, c.v)) > 0
)
SELECT q_id, nbr_id, ROUND(cos_raw, 4) AS cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, nbr_id) AS rn
  FROM rerank) WHERE rn <= 5
ORDER BY q_id, nbr_id
"""


def q_d3_sample(spark, sf_dir):
    """D3 seeded random sample (`processors/processor.py:295-320`).
    The sampled ROWS are nondeterministic across engines by design
    (Spark's Bernoulli sampler is engine-specific), so — the
    emb_ann_recall pattern (r13, VERDICT r12 item 2) — the oracle
    pins deterministic VERDICTS about the sample instead of the
    sample: (a) ``subset_violations``: every sampled row exists in
    the source (distributed anti-join on the (l_orderkey,
    l_linenumber) key; always 0 for a correct sampler); (b)
    ``count_in_bounds``: the sample size sits within ±6σ binomial
    bounds around n·p (a 6σ miss is ~2e-9 — a sampler bug, not
    luck); (c) ``seed_determinism_ok``: re-sampling the same source
    with the same seed is bit-identical (two exceptAll probes, both
    directions). ``n_source`` is SQL-derivable so the oracle pins a
    data-driven value, not only constants."""
    ds = D(spark, sf_dir, "lineitem")
    p = 0.1
    s1 = ds.random_sample(p, seed=42).df
    s2 = ds.random_sample(p, seed=42).df
    n = ds.df.count()
    k = s1.count()
    mu = n * p
    sd = (n * p * (1.0 - p)) ** 0.5
    bad = (
        s1.select("l_orderkey", "l_linenumber")
        .join(
            ds.df.select("l_orderkey", "l_linenumber"),
            ["l_orderkey", "l_linenumber"],
            "left_anti",
        )
        .count()
    )
    deterministic = (
        s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    )
    return spark.createDataFrame(
        [
            (
                n,
                bad,
                bool(mu - 6.0 * sd <= k <= mu + 6.0 * sd),
                bool(deterministic),
            )
        ],
        schema=(
            "n_source long, subset_violations long,"
            " count_in_bounds boolean, seed_determinism_ok boolean"
        ),
    )


SQL_D3_SAMPLE = (
    "SELECT COUNT(*) AS n_source, CAST(0 AS BIGINT) AS"
    " subset_violations, TRUE AS count_in_bounds,"
    " TRUE AS seed_determinism_ok FROM lineitem"
)


# --------------------------------------------------------------------------
# additional declared-surface queries: quartiles, explode, cube,
# analytic windows, date extraction, SQL API
# --------------------------------------------------------------------------


def q_a1_quartiles(spark, sf_dir):
    """A1 describe()-style quartiles — exact percentile (interpolating),
    matching DuckDB quantile_cont."""
    return T(spark, sf_dir, "lineitem").agg(
        F.round(F.stddev("l_quantity"), 4).alias("std_qty"),
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
    )


SQL_A1_QUARTILES = (
    "SELECT ROUND(stddev(l_quantity),4) AS std_qty, "
    "quantile_cont(l_quantity, 0.25) AS p25, "
    "quantile_cont(l_quantity, 0.5) AS p50, "
    "quantile_cont(l_quantity, 0.75) AS p75 FROM lineitem"
)


def q_f_explode_wordcount(spark, sf_dir):
    """UDTF surface (explode — absent in reference, §2.8): word count."""
    return (
        T(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(20)
    )


SQL_EXPLODE = (
    "SELECT w, COUNT(*) AS cnt FROM (SELECT unnest(string_split(text,' ')) AS w "
    "FROM documents) t WHERE w <> '' GROUP BY w ORDER BY cnt DESC, w LIMIT 20"
)


def q_a_cube(spark, sf_dir):
    """Cube (absent in reference; free via df.cube)."""
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


SQL_A_CUBE = (
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders "
    "GROUP BY CUBE(o_orderstatus, o_orderpriority) "
    "ORDER BY o_orderstatus, o_orderpriority"
)


def q_w_analytics(spark, sf_dir):
    """Analytic window functions: lag delta + ntile buckets."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        T(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 2
            ).alias("delta"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(200)
    )


SQL_W_ANALYTICS = (
    "SELECT o_custkey, o_orderkey, "
    "ROUND(o_totalprice - LAG(o_totalprice, 1, 0.0) OVER "
    "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta, "
    "NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile "
    "FROM orders ORDER BY o_custkey, o_orderkey LIMIT 200"
)


def q_f_date_extract(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("y", "m")
    )


SQL_F_DATE_EXTRACT = (
    "SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, COUNT(*) AS cnt "
    "FROM orders GROUP BY y, m ORDER BY y, m"
)


# identical text runs on both engines — the engine's SQL API surface
SQL_Q10_SHARED = """
SELECT c.c_custkey, c.c_name, ROUND(SUM(l.l_extendedprice*(1-l.l_discount)),2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_sql_surface(spark, sf_dir):
    """The engine's SQL API: temp views + spark.sql, one ANSI string
    shared verbatim with the oracle."""
    for t in ["customer", "orders", "lineitem"]:
        Dataset(T(spark, sf_dir, t)).to_view(t)
    return spark.sql(SQL_Q10_SHARED)


# --------------------------------------------------------------------------
# flagship analytical queries (TPC-H shapes over the synthetic tables)
# --------------------------------------------------------------------------


def q_h1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan -> filter -> wide agg. The flagship."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_H1 = """
SELECT l_returnflag, l_linestatus,
  ROUND(SUM(l_quantity),2) AS sum_qty,
  ROUND(SUM(l_extendedprice),2) AS sum_base_price,
  ROUND(SUM(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
  ROUND(SUM(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
  ROUND(AVG(l_quantity),4) AS avg_qty,
  ROUND(AVG(l_extendedprice),4) AS avg_price,
  ROUND(AVG(l_discount),4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


def q_h3_top_orders(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join -> agg -> top-k by revenue."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


SQL_H3 = """
SELECT o_orderkey, revenue, o_orderdate FROM (
  SELECT o.o_orderkey, o.o_orderdate,
    ROUND(SUM(l.l_extendedprice*(1-l.l_discount)),2) AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
  GROUP BY o.o_orderkey, o.o_orderdate
) ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q_h5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join with two broadcast dims."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("n_name")
    )


SQL_H5 = """
SELECT n.n_name, ROUND(SUM(l.l_extendedprice*(1-l.l_discount)),2) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name ORDER BY n.n_name
"""


# --------------------------------------------------------------------------
# beyond-reference joins (as-of / range), IVF ANN, sliding/session windows
# --------------------------------------------------------------------------


def q_j_asof(spark, sf_dir):
    """As-of join (beyond reference; the reference's only join is a
    single-key left equi-join, `processors/processor.py:197`). Latest
    purchase at-or-before each click, per user — implemented as the
    union-window formulation (one shuffle, no pair explosion); oracle
    is DuckDB's native ASOF JOIN."""
    from dataprocessingframework_spark.operators.joins import asof_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("purchase_value"))
    )
    return (
        asof_join(clicks, purchases, on="user_id", left_ts="ts")
        .select("event_id", "user_id", "matched_ts", "purchase_value")
        .orderBy("event_id")
    )


SQL_J_ASOF = """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts, ROUND(MAX(value),2) AS purchase_value
           FROM events WHERE event_type='purchase' GROUP BY user_id, ts)
SELECT c.event_id, c.user_id, p.ts AS matched_ts, p.purchase_value
FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


def q_j_asof_nulls(spark, sf_dir):
    """As-of join with a NULLABLE right payload — regression gate for
    the struct-packed match (`operators/joins.py:asof_join`): a NULL
    payload field in the matched right row must stay NULL, never be
    back-filled from an older right row. Oracle is DuckDB's native
    ASOF JOIN, which has exactly these semantics."""
    from dataprocessingframework_spark.operators.joins import asof_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.round(F.max("value"), 2).alias("_pv"),
            F.count(F.lit(1)).alias("pcnt"),
        )
        .select(
            "user_id",
            "ts",
            F.when(F.col("_pv") > 50, F.col("_pv")).alias("pv_high"),
            "pcnt",
        )
    )
    return (
        asof_join(clicks, purchases, on="user_id", left_ts="ts")
        .select("event_id", "user_id", "matched_ts", "pv_high", "pcnt")
        .orderBy("event_id")
    )


SQL_J_ASOF_NULLS = """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts,
                  CASE WHEN ROUND(MAX(value),2) > 50
                       THEN ROUND(MAX(value),2) END AS pv_high,
                  COUNT(*) AS pcnt
           FROM events WHERE event_type='purchase' GROUP BY user_id, ts)
SELECT c.event_id, c.user_id, p.ts AS matched_ts, p.pv_high, p.pcnt
FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


def q_j_range(spark, sf_dir):
    """Range (point-in-interval) join via the bin-and-equijoin path:
    quantity bands over lineitem. Bucketing turns the BETWEEN join into
    an equi-join on bucket id — the big-big shape that scales."""
    from pyspark.sql import Row

    from dataprocessingframework_spark.operators.joins import range_join

    li = T(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    bands = spark.createDataFrame(
        [Row(band_id=i + 1, lo=i * 10 + 1, hi=(i + 1) * 10) for i in range(5)]
    )
    return (
        range_join(li, bands, "l_quantity", "lo", "hi", bucket_width=10)
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("band_id")
    )


SQL_J_RANGE = """
SELECT b.band_id, COUNT(*) AS cnt, ROUND(SUM(l.l_extendedprice),2) AS sum_price
FROM lineitem l
JOIN (VALUES (1,1,10),(2,11,20),(3,21,30),(4,31,40),(5,41,50))
     AS b(band_id, lo, hi)
  ON l.l_quantity BETWEEN b.lo AND b.hi
GROUP BY b.band_id ORDER BY b.band_id
"""


def q_emb_ivf_topk(spark, sf_dir):
    """IVF coarse-quantizer ANN (the FAISS-style scale path, next to
    emb_lsh_topk), on the UNSEEDED Lloyd quantizer — the float-mean
    iteration order is engine-specific, so its top-k rows cannot be
    value-matched by another engine (the seeded twin
    emb_ivf_topk_seeded FULL-oracles the probe arithmetic). r13
    (VERDICT r12 item 2): instead of a no-oracle rows check, collapse
    the engine-specific half to a deterministic recall@k >= floor
    boolean (the emb_ann_recall pattern) and value-match the exact
    half (pair count + mean exact top-k cosine) against the DuckDB
    brute force. All set arithmetic distributed: exact/approx lists
    semi-join per (q_id, nbr_id), only per-query counts aggregate."""
    from dataprocessingframework_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    emb = T(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    k = 5
    exact = cosine_topk(emb, qs, k=k).select("q_id", "nbr_id", "cos")
    approx = ivf_topk(emb, qs, k=k, n_cells=16, n_probe=4)
    hits = (
        exact.join(
            approx.select("q_id", "nbr_id"), ["q_id", "nbr_id"], "left_semi"
        )
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    per_q = (
        exact.select("q_id")
        .distinct()
        .join(hits, "q_id", "left")
        .select(F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"))
    )
    recall = float(
        per_q.agg(F.round(F.avg(F.col("n_hit") / F.lit(k)), 4)).collect()[
            0
        ][0]
    )
    n_exact, mean_cos = exact.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("cos"), 4).alias("m"),
    ).collect()[0]
    return spark.createDataFrame(
        [(k, 10, int(n_exact), float(mean_cos), recall >= RECALL_FLOOR_IVF_K5)],
        schema=(
            "k int, n_queries int, n_exact_pairs long,"
            " mean_exact_cos double, recall_ivf_ok boolean"
        ),
    )


# Deterministic floor: recall of the unseeded-Lloyd IVF probe at
# k=5 / n_cells=16 / n_probe=4 over the 10 lowest-id query vectors
# depends only on the fixed testdata (measured: sf0.001 0.54,
# sf0.01 0.52, sf0.1 0.62 at authoring time); set below the
# observed minimum with margin — the boolean is the contract
# "probing 1/4 of a 16-cell index keeps about half of the exact
# neighbors on clusterless random data", not a precision pin.
RECALL_FLOOR_IVF_K5 = 0.4

SQL_EMB_IVF_TOPK = """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS nbr_id,
    list_dot_product(q.v, c.v) /
      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
      AS cos_raw
  FROM q, c WHERE c.vec_id <> q.vec_id
),
topk AS (
  SELECT ROUND(cos_raw, 4) AS cos FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY cos_raw DESC, nbr_id) AS rn
    FROM scored
  ) WHERE rn <= 5
)
SELECT CAST(5 AS INTEGER) AS k, CAST(10 AS INTEGER) AS n_queries,
       COUNT(*) AS n_exact_pairs,
       ROUND(AVG(cos), 4) AS mean_exact_cos,
       TRUE AS recall_ivf_ok
FROM topk
"""


def q_stream_sliding(spark, sf_dir):
    """§2.12 sliding (hopping) event-time window — 30 min window every
    15 min, so each event lands in exactly two windows. DuckDB oracle
    expands the hops explicitly (time_bucket - h*slide)."""
    from dataprocessingframework_spark.streaming import sliding_window_agg

    return sliding_window_agg(
        T(spark, sf_dir, "events"),
        window="30 minutes",
        slide="15 minutes",
        group_cols=["event_type"],
    ).orderBy("win_start", "event_type")


SQL_STREAM_SLIDING = """
SELECT time_bucket(INTERVAL '15 minutes', ts) - h * INTERVAL '15 minutes'
         AS win_start,
       time_bucket(INTERVAL '15 minutes', ts) - h * INTERVAL '15 minutes'
         + INTERVAL '30 minutes' AS win_end,
       event_type, COUNT(*) AS cnt
FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS h) hops
GROUP BY win_start, win_end, event_type
ORDER BY win_start, event_type
"""


def q_stream_session(spark, sf_dir):
    """§2.12 session windows (gap-based sessionization per user).
    Spark `session_window` ≡ classic SQL sessionization: a new session
    starts when the gap from the previous event reaches the timeout;
    session_end = last event + gap."""
    from dataprocessingframework_spark.streaming import session_window_agg

    return session_window_agg(
        T(spark, sf_dir, "events"), gap="15 minutes", key_col="user_id"
    ).orderBy("user_id", "session_start")


SQL_STREAM_SESSION = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL '15 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '15 minutes' AS session_end,
       user_id, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
"""


def q_j_salted(spark, sf_dir):
    """Skew-resistant salted equi-join (beyond reference): the salt is
    random but the result SET is salt-invariant, so a plain-join oracle
    checks it exactly."""
    from dataprocessingframework_spark.operators.joins import salted_join

    orders = T(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        salted_join(orders, cust, on="c_custkey", salt=8)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("c_nationkey")
    )


SQL_J_SALTED = """
SELECT c.c_nationkey, COUNT(*) AS cnt,
       ROUND(SUM(o.o_totalprice),2) AS sum_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey ORDER BY c.c_nationkey
"""


def q_d_hash_sample(spark, sf_dir):
    """Deterministic hash-sampling (beyond reference): membership is a
    pure function of the key (md5-derived), so the exact sampled row
    set is engine-portable and oracle-checkable — the reproducible
    holdout-split primitive for training corpora."""
    from dataprocessingframework_spark.operators.sampling import hash_sample

    return (
        hash_sample(T(spark, sf_dir, "orders"), "o_orderkey", num=1, denom=20)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


SQL_D_HASH_SAMPLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)),1,15))
           AS BIGINT) % 20 < 1
ORDER BY o_orderkey
"""


def q_d_temperature_sample(spark, sf_dir):
    """Temperature sampling (alpha=0.5) of documents by source: the
    multilingual-corpus rebalancing move, with rates derived from the
    per-source counts inside the plan and membership on the portable
    integral-threshold hash — the full sampled row set is
    oracle-checkable."""
    from dataprocessingframework_spark.operators.sampling import (
        temperature_sample,
    )

    return (
        temperature_sample(
            T(spark, sf_dir, "documents"),
            "source",
            "doc_id",
            alpha=0.5,
            target_fraction=0.5,
        )
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


SQL_D_TEMPERATURE_SAMPLE = """
WITH counts AS (
  SELECT source, COUNT(*) AS n_g FROM documents GROUP BY source
), tot AS (
  SELECT SUM(n_g) AS n_tot, SUM(pow(n_g, 0.5)) AS z FROM counts
), rates AS (
  SELECT source,
         LEAST(1.0, 0.5 * t.n_tot * pow(c.n_g, 0.5) / t.z / c.n_g) AS r
  FROM counts c CROSS JOIN tot t
)
SELECT d.doc_id, d.source, d.lang
FROM documents d
JOIN rates ON d.source IS NOT DISTINCT FROM rates.source
WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)),1,15))
           AS BIGINT) % 1000000
      < CAST(floor(r * 1000000) AS BIGINT)
ORDER BY d.doc_id
"""


def q_d_per_group_sample(spark, sf_dir):
    """Exactly-k-per-source deterministic sample (fixed COUNTS where
    d_temperature_sample fixes rates): rank by portable key hash
    within each group, keep 20 — the per-stratum eval-subset cut."""
    from dataprocessingframework_spark.operators.sampling import (
        per_group_sample,
    )

    return (
        per_group_sample(T(spark, sf_dir, "documents"), "source", "doc_id", k=20)
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


SQL_D_PER_GROUP_SAMPLE = """
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15))
                         AS BIGINT) ASC, doc_id ASC
         ) AS rn
  FROM documents
)
SELECT doc_id, source FROM ranked WHERE rn <= 20 ORDER BY source, doc_id
"""


def q_d_stratified_sample(spark, sf_dir):
    """Deterministic STRATIFIED sampling: per-lang keep rates over the
    portable key hash — the corpus-rebalancing move (down-weight the
    dominant language, keep the rest whole), rerun- and
    engine-reproducible unlike seeded sampleBy."""
    from dataprocessingframework_spark.operators.sampling import (
        stratified_hash_sample,
    )

    return (
        stratified_hash_sample(
            T(spark, sf_dir, "documents"),
            "lang",
            "doc_id",
            rates={"en": 30, "de": 100, "es": 100, "fr": 100},
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


SQL_D_STRATIFIED = """
SELECT doc_id, lang FROM documents
WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15))
           AS BIGINT) % 100
      < CASE lang WHEN 'en' THEN 30 WHEN 'de' THEN 100
                  WHEN 'es' THEN 100 WHEN 'fr' THEN 100 ELSE 0 END
ORDER BY doc_id
"""


def q_dd_incremental(spark, sf_dir):
    """Incremental ingest dedup: the doc_id>=400 'new batch' against the
    doc_id<400 'existing corpus' — corpus rows never move, only batch
    keys are checked (anti-join) then batch-internal keep-first. Keyed
    on the n_chars metadata column (the reference's canonical dedup is
    a metadata column too, image_phash_8)."""
    from dataprocessingframework_spark.operators.dedup import incremental_dedup

    docs = T(spark, sf_dir, "documents")
    out = incremental_dedup(
        docs.filter(F.col("doc_id") >= 400),
        docs.filter(F.col("doc_id") < 400),
        ["n_chars"],
        order_col="doc_id",
    )
    return out.select("doc_id", "n_chars").orderBy("doc_id")


SQL_DD_INCREMENTAL = """
WITH corpus AS (SELECT DISTINCT n_chars FROM documents WHERE doc_id < 400),
fresh AS (
  SELECT d.doc_id, d.n_chars FROM documents d
  WHERE d.doc_id >= 400
    AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.n_chars = d.n_chars)
)
SELECT MIN(doc_id) AS doc_id, n_chars FROM fresh GROUP BY n_chars
ORDER BY doc_id
"""


def q_h6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape — the canonical predicate-pushdown query: every
    filter reaches the parquet scan (row-group pruning at 100 TB), and
    the result is a single partial/final agg with no grouped shuffle."""
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


SQL_H6 = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_h7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional nation-pair trade volume. Five-way
    join where the two nation legs broadcast; the disjunctive pair
    predicate is applied post-join (Catalyst pushes each side's IsIn
    down to the broadcast dims)."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"),
                              F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"),
                              F.col("n_name").alias("cust_nation")))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_H7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       ROUND(SUM(l.l_extendedprice*(1-l.l_discount)),2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q_h14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation ratio (promo revenue
    share) over a month of lineitem joined to part. Part broadcasts;
    the date filter pushes to the fact scan."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = T(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


SQL_H14 = """
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice*(1-l.l_discount)
                              ELSE 0.0 END)
             / SUM(l.l_extendedprice*(1-l.l_discount)), 4) AS promo_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
"""


def q_h15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier revenue in a window, keep suppliers at
    the global max (scalar-subquery HAVING). The per-supplier agg
    shuffles once; the global max is a broadcast scalar, not a driver
    collect."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    s = T(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


SQL_H15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice*(1-l_discount)),2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


def q_h18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders via a grouped-HAVING
    semi-join. The qualifying-key set is small after HAVING (top ~1% of
    orders) → broadcast semi-join into the fact re-scan."""
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


SQL_H18 = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       ROUND(SUM(l.l_quantity),2) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
"""


def q_h19_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive band predicates
    across the join (brand x size x quantity). Catalyst extracts the
    common join key and pushes the residual OR as a post-join filter;
    part broadcasts."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    band = (
        ((F.col("p_brand") == "Brand#1")
         & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2")
           & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3")
           & F.col("p_size").between(1, 50)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(band).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("cnt"),
    )


SQL_H19 = """
SELECT ROUND(SUM(l.l_extendedprice*(1-l.l_discount)),2) AS revenue,
       COUNT(*) AS cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand='Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand='Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand='Brand#3' AND p.p_size BETWEEN 1 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
"""


def q_h22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders — scalar subquery (broadcast) + anti-join, grouped by
    nation."""
    c = T(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    recent = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


SQL_H22 = """
SELECT c_nationkey, COUNT(*) AS numcust, ROUND(SUM(c_acctbal),2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def q_h4_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: order-priority distribution over orders having
    at least one qualifying lineitem (EXISTS -> broadcast semi-join of
    the filtered key set)."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = (
        T(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(li, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_H4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_h10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returned items per customer in
    a quarter. Fact-side filters (returnflag, order-date window) push
    into the scans; customer & nation broadcast into the lineitem-side
    agg; top-20 by revenue is a single takeOrdered, not a global sort.

    Reference parity: analytics surface of DPF datasets
    (`/root/reference/DPF/dataset_reader.py` filter/agg pipelines);
    query text is the standard public TPC-H Q10 reduced to the
    generator's schema (no address/phone/comment columns).
    """
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


SQL_H10 = """
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
       ROUND(SUM(l.l_extendedprice*(1-l.l_discount)),2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey LIMIT 20
"""


def q_h12_priority_by_status(spark, sf_dir):
    """TPC-H Q12 shape (reduced schema): per-linestatus counts of
    high- vs low-priority orders over a ship-date year. The generator
    omits l_shipmode/commitdate/receiptdate, so linestatus stands in
    for shipmode; the CASE-sum pivot and the orders⋈lineitem shape are
    Q12's. One broadcast join (orders side is filtered by the fact's
    date window only after the join, so lineitem drives), one groupBy.
    """
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = T(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


SQL_H12 = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus ORDER BY l.l_linestatus
"""


def q_h21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (reduced schema): suppliers that solely 'failed'
    a multi-supplier order. The generator omits commit/receipt dates,
    so l_returnflag='R' marks the failing lineitem. Shape preserved:
    the EXISTS (another supplier in the order) and NOT EXISTS (another
    failing supplier in the order) correlated subqueries become two
    aggregated per-order key sets semi-joined back into the fact — one
    shuffle each on l_orderkey (the same key, so AQE reuses the
    exchange partitioning), never a correlated per-row re-scan; AQE
    picks broadcast when a key set lands small.
    """
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = T(spark, sf_dir, "supplier")
    fail = li.filter(F.col("l_returnflag") == "R")
    # orders with >1 distinct supplier overall
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    # orders where exactly one supplier failed
    solo_fail = (
        fail.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("nf"))
        .filter(F.col("nf") == 1)
        .select("l_orderkey")
    )
    return (
        fail.join(o, fail["l_orderkey"] == o["o_orderkey"], "left_semi")
        .join(multi, "l_orderkey", "left_semi")
        .join(solo_fail, "l_orderkey", "left_semi")
        .join(F.broadcast(s), fail["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


SQL_H21 = """
SELECT s.s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_returnflag = 'R'
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 100
"""


def q_h8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_3 suppliers' share of region-0 customer
    revenue by year — 7-way join (both nation legs + region broadcast)
    with a conditional-agg ratio on top."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_regionkey") == 0)
    n_cust = F.broadcast(
        n.select(F.col("n_nationkey").alias("cn_key"),
                 F.col("n_regionkey").alias("cn_region"))
    )
    n_supp = F.broadcast(
        n.select(F.col("n_nationkey").alias("sn_key"),
                 F.col("n_name").alias("supp_nation"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n_cust, F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n_supp, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
                        0.0
                    )
                )
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


SQL_H8 = """
SELECT year(o.o_orderdate) AS o_year,
       ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l.l_extendedprice*(1-l.l_discount) ELSE 0.0 END)
             / SUM(l.l_extendedprice*(1-l.l_discount)), 4) AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_regionkey = 0
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
GROUP BY o_year ORDER BY o_year
"""


def q_a_median_exact(spark, sf_dir):
    """Exact (interpolating) percentiles per group — Spark `percentile`
    ≡ DuckDB `quantile_cont`. Exact percentile is a sort-based agg
    (heavier than approx_percentile's sketch); grouped by returnflag so
    each group sorts independently. a1_quartiles covers the approx
    path; this is the exact one."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("med_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias(
                "p90_price"
            ),
        )
        .orderBy("l_returnflag")
    )


SQL_A_MEDIAN = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
       ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_h13_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts —
    left join (customers with zero orders kept) + two-level
    aggregation. Both aggs are partial/final; the second input is one
    row per customer, so its shuffle is tiny."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_H13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q_h17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: revenue from small-quantity orders of one
    brand, where "small" is a per-part correlated threshold
    (0.2 x that part's average quantity). The correlated scalar
    subquery becomes a per-part pre-agg joined back — the pre-agg
    output is one row per part, broadcastable at any scale."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    thresholds = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_floor"))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(thresholds, li["l_partkey"] == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_floor"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


SQL_H17 = """
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#5'
WHERE l.l_quantity < (
  SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey)
"""


# --------------------------------------------------------------------------
# synthetic partsupp: the testdata generator omits TPC-H's partsupp
# table, which blocks Q2/Q9/Q11/Q16/Q20.  Rather than leave that SQL
# surface unexercised, derive a DETERMINISTIC partsupp from part x
# supplier with pure integer arithmetic — both engines compute the
# exact same rows from the same parquet inputs, so the usual FULL
# oracle applies.  Shape mirrors dbgen: 4 suppliers per part, supplier
# keys spread by a stride that is coprime-ish with the supplier counts
# used by the generator (10/100/1000), availability and cost derived
# from (partkey, suppkey) alone.  Cost lands on exactly 2 decimals so
# DECIMAL casts are exact.
# --------------------------------------------------------------------------


def _partsupp(spark, sf_dir):
    """Deterministic synthetic partsupp (ps_partkey, ps_suppkey,
    ps_availqty, ps_supplycost DECIMAL(12,2)).

    Scale shape: part x 4 is a map-only explode; the supplier count
    arrives via a broadcast 1-row aggregate (no driver collect), so
    the whole derivation is embarrassingly parallel and partitions
    with the part table."""
    p = T(spark, sf_dir, "part").select("p_partkey")
    s_cnt = (
        T(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("s_cnt"))
    )
    return (
        p.crossJoin(F.broadcast(s_cnt))
        .select(
            "p_partkey",
            F.explode(
                F.array(*[F.lit(i) for i in range(4)])
            ).alias("i"),
            "s_cnt",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (
                (F.col("p_partkey") * 7 + F.col("i") * 13) % F.col("s_cnt")
            ).alias("ps_suppkey"),
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            (
                (F.col("ps_partkey") * 23 + F.col("ps_suppkey") * 41) % 9999
                + 1
            ).alias("ps_availqty"),
            (
                (
                    (F.col("ps_partkey") * 17 + F.col("ps_suppkey") * 31)
                    % 9000
                    + 100
                )
                .cast("decimal(12,0)")
                / 100
            )
            .cast("decimal(12,2)")
            .alias("ps_supplycost"),
        )
    )


_PARTSUPP_CTE = """
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         (ps_partkey*23 + ps_suppkey*41) % 9999 + 1 AS ps_availqty,
         CAST(CAST((ps_partkey*17 + ps_suppkey*31) % 9000 + 100
              AS DECIMAL(12,0)) / 100 AS DECIMAL(12,2)) AS ps_supplycost
  FROM (
    SELECT p_partkey AS ps_partkey,
           (p_partkey*7 + gen.i*13)
             % (SELECT COUNT(*) FROM supplier) AS ps_suppkey
    FROM part CROSS JOIN (VALUES (0),(1),(2),(3)) AS gen(i)
  )
)
"""


def q_h2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (synthetic partsupp): for STANDARD parts of one
    size, the region-3 (EUROPE) supplier offering the minimum supply
    cost — the classic correlated-MIN subquery.

    Scale shape: the correlated subquery decorrelates into a per-part
    MIN over the region-restricted partsupp (one groupBy whose output
    is |parts| rows) joined back on (partkey, cost); supplier/nation/
    region dims broadcast.  partsupp itself is map-only synthetic, so
    nothing here shuffles more than once.  Cost is DECIMAL so the
    MIN-equality join cannot be split by float noise."""
    ps = _partsupp(spark, sf_dir)
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    region_sup = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eu = ps.join(
        F.broadcast(region_sup), ps["ps_suppkey"] == F.col("s_suppkey")
    )
    min_cost = ps_eu.groupBy(
        F.col("ps_partkey").alias("m_partkey")
    ).agg(F.min("ps_supplycost").alias("min_cost"))
    return (
        ps_eu.join(
            min_cost,
            (ps_eu["ps_partkey"] == F.col("m_partkey"))
            & (ps_eu["ps_supplycost"] == F.col("min_cost")),
        )
        .join(F.broadcast(p), ps_eu["ps_partkey"] == p["p_partkey"])
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


SQL_H2 = f"""
WITH {_PARTSUPP_CTE},
eu_sup AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE')
SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
       CAST(ps_supplycost AS DOUBLE) AS supplycost
FROM partsupp
JOIN eu_sup ON s_suppkey = ps_suppkey
JOIN part ON p_partkey = ps_partkey
         AND p_size <= 15 AND p_type = 'STANDARD'
WHERE ps_supplycost = (
  SELECT MIN(ps2.ps_supplycost)
  FROM partsupp ps2 JOIN eu_sup e2 ON e2.s_suppkey = ps2.ps_suppkey
  WHERE ps2.ps_partkey = partsupp.ps_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_h9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (synthetic partsupp): profit by supplier nation
    and ship year for 'red' parts — revenue minus supply cost.  Uses
    l_shipdate's year (the testdata lineitem carries no order date;
    documented reduction like h12/h21).

    Scale shape: lineitem joins partsupp on its co-partitioned
    (partkey, suppkey) composite key — one shuffle each side; part
    (filtered) and supplier/nation broadcast.  Money math is DECIMAL
    end-to-end so the grouped sums are order-independent and
    bit-identical across engines."""
    li = T(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(8,2)") - F.col("l_discount").cast("decimal(8,2)"))
        - F.col("ps_supplycost") * F.col("l_quantity").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(
            ps,
            (li["l_partkey"] == ps["ps_partkey"])
            & (li["l_suppkey"] == ps["ps_suppkey"]),
        )
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .select(
            "nation", "o_year", F.round("sum_profit", 2).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


SQL_H9 = f"""
WITH {_PARTSUPP_CTE}
SELECT n_name AS nation,
       CAST(YEAR(l_shipdate) AS INT) AS o_year,
       ROUND(CAST(SUM(
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))
         - ps_supplycost * CAST(l_quantity AS DECIMAL(18,2))
       ) AS DOUBLE), 2) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
GROUP BY n_name, YEAR(l_shipdate)
ORDER BY nation, o_year DESC
"""


def q_h11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (synthetic partsupp): parts whose NATION_3
    stock value beats a scalar-subquery threshold.  TPC-H's fixed
    FRACTION degenerates across scale factors (everything passes at
    sf0.001, nothing at sf0.1), so the threshold is 1.5x the average
    per-part value — same HAVING-vs-scalar-aggregate shape, SF-stable
    selectivity.

    Scale shape: one groupBy to per-part values; the threshold is a
    1-row aggregate OF THAT result (reused, not recomputed) broadcast
    back.  The compare runs on DECIMAL*integers (value*100 vs
    2*total/3n cross-multiplied) so no engine's float rounding can
    flip a boundary part."""
    ps = _partsupp(spark, sf_dir)
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    sup3 = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey"
    )
    per_part = (
        ps.join(F.broadcast(sup3), ps["ps_suppkey"] == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost") * F.col("ps_availqty")
            ).alias("value_dec")
        )
        # cents as BIGINT: exact integer arithmetic for the threshold
        .select(
            "ps_partkey",
            "value_dec",
            (F.col("value_dec") * 100).cast("long").alias("cents"),
        )
    )
    totals = per_part.agg(
        F.sum("cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        # value > 1.5 * (total/n)  <=>  2*n*value > 3*total  (exact)
        .filter(
            F.col("cents") * 2 * F.col("n_parts")
            > F.col("total_cents") * 3
        )
        .select(
            "ps_partkey",
            F.col("value_dec").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


SQL_H11 = f"""
WITH {_PARTSUPP_CTE},
per_part AS (
  SELECT ps_partkey,
         SUM(ps_supplycost * ps_availqty) AS value_dec,
         CAST(SUM(ps_supplycost * ps_availqty) * 100 AS BIGINT) AS cents
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
  GROUP BY ps_partkey),
totals AS (
  SELECT SUM(cents) AS total_cents, COUNT(*) AS n_parts FROM per_part)
SELECT ps_partkey, CAST(value_dec AS DOUBLE) AS value
FROM per_part, totals
WHERE cents * 2 * n_parts > total_cents * 3
ORDER BY value DESC, ps_partkey
"""


def q_h16_supplier_relationship(spark, sf_dir):
    """TPC-H Q16 shape (synthetic partsupp): distinct-supplier counts
    per (brand, type, size) over filtered parts, excluding flagged
    suppliers.  The testdata supplier has no s_comment, so the
    'complaints' exclusion becomes s_acctbal < 0 (same NOT-IN
    anti-join shape; documented reduction).

    Scale shape: the exclusion list is a broadcast anti-join (non-null
    key, so NOT IN == anti); part attributes arrive by broadcast; the
    only shuffle is the final grouped COUNT(DISTINCT), whose key space
    (brand x type x size) is tiny and unskewed."""
    ps = _partsupp(spark, sf_dir)
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    bad = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(
            F.broadcast(bad),
            ps["ps_suppkey"] == bad["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


SQL_H16 = f"""
WITH {_PARTSUPP_CTE}
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1,5,9,13,17,21,25,29)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_h20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (synthetic partsupp): AMERICA suppliers whose
    stock of 'blue' parts exceeds half of what they shipped in 1997 —
    nested IN subqueries over a correlated per-(part,supplier) sum.
    (ev_dominant_users carries the same shape on the events stream;
    this is the canonical partsupp version.)

    Scale shape: the correlated scalar decorrelates into one grouped
    sum over the date-pruned lineitem keyed by the SAME composite key
    the partsupp probe joins on — one shuffle, no re-scan per
    supplier; part filter and nation dim broadcast; the final
    qualifying-supplier set is DISTINCT ps_suppkey (tiny) left-semi
    joined into the supplier dim."""
    ps = _partsupp(spark, sf_dir)
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    p = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    shipped = li.groupBy(
        F.col("l_partkey").alias("sh_partkey"),
        F.col("l_suppkey").alias("sh_suppkey"),
    ).agg(F.sum("l_quantity").alias("shipped_qty"))
    qualifying = (
        ps.join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .join(
            shipped,
            (ps["ps_partkey"] == F.col("sh_partkey"))
            & (ps["ps_suppkey"] == F.col("sh_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("shipped_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(
            qualifying, s["s_suppkey"] == F.col("ps_suppkey"), "left_semi"
        )
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


SQL_H20 = f"""
WITH {_PARTSUPP_CTE}
SELECT s_name, s_suppkey
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey AND r_name = 'AMERICA'
WHERE s_suppkey IN (
  SELECT ps_suppkey FROM partsupp
  WHERE ps_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
    AND ps_availqty > (
      SELECT 0.5 * SUM(l_quantity) FROM lineitem
      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        AND l_shipdate >= DATE '1997-01-01'
        AND l_shipdate < DATE '1998-01-01'))
ORDER BY s_name
"""


def q_emb_kmeans(spark, sf_dir):
    """Embedding k-means (semantic-dedup decision step) as a
    driver-checkable validity summary: the cluster geometry is
    iterative floating-point and engine-specific, so the oracle pins
    the PORTABLE invariants — every vector got an assignment
    (n_assigned value-matches DuckDB's COUNT(*)), the seeded run
    yields all 8 non-empty clusters, and each cluster representative
    is a member of the cluster it represents. Determinism and
    WSS-better-than-random stay asserted in tests/test_clustering.py."""
    from dataprocessingframework_spark.operators.clustering import (
        cluster_representatives,
        kmeans_clusters,
    )

    emb = T(spark, sf_dir, "embeddings")
    assign = kmeans_clusters(emb, "embedding", "vec_id", k=8)
    reps = (
        cluster_representatives(assign, emb, "vec_id")
        .select(
            F.col("cluster").alias("rep_cluster"),
            F.col("vec_id").alias("rep_vec_id"),
        )
    )
    reps_valid = (
        reps.join(
            assign, reps["rep_vec_id"] == assign["vec_id"], "inner"
        )
        .filter(F.col("rep_cluster") == F.col("cluster"))
        .count()
        == reps.count()
    )
    return assign.agg(
        F.count_distinct("cluster").alias("n_clusters"),
        F.count(F.lit(1)).alias("n_assigned"),
        F.lit(bool(reps_valid)).alias("reps_valid"),
    )


SQL_EMB_KMEANS = """
SELECT CAST(8 AS BIGINT) AS n_clusters, COUNT(*) AS n_assigned,
       TRUE AS reps_valid
FROM embeddings
"""


def q_pipeline_curation(spark, sf_dir):
    """Flagship LLM-corpus curation pipeline, end-to-end through the
    Pipeline runner (§3.3 semantics): derive features (langid, quality,
    fingerprint) -> keep English above the quality floor -> exact
    near-dup removal (deterministic keep-first by fingerprint) ->
    per-source corpus stats. Every stage is JVM-side; the only
    shuffles are the dedup window and the final tiny agg."""
    from dataprocessingframework_spark.plans.pipeline import Pipeline

    docs = Dataset(T(spark, sf_dir, "documents"))
    pipe = (
        Pipeline()
        .add_dataframe_filter(
            lambda df: df.select(
                "doc_id",
                "source",
                text_analysis.lang_id("text").alias("lang_pred"),
                text_analysis.quality_score("text").alias("quality"),
                text_analysis.fingerprint("text").alias("fingerprint"),
            )
        )
        .add_dataframe_filter(
            lambda df: df.filter(
                (F.col("lang_pred") == "en") & (F.col("quality") >= 0.5)
            )
        )
        .add_dedup(["fingerprint"], order_col="doc_id")
    )
    out, reports = pipe.run(docs)
    assert all(r.status == "ok" for r in reports)
    return (
        out.df.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("source")
    )


SQL_PIPELINE_CURATION = f"""
WITH t AS (
  SELECT doc_id, source,
    len(list_filter(string_split(text,' '), x -> x <> '')) AS n,
    length(text) AS total,
    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
    len(list_filter(string_split(text,' '), x -> x IN ({_STOPS_SQL}))) AS hits,
    {_lang_hits_sql('en')},
    {_lang_hits_sql('es')},
    {_lang_hits_sql('de')},
    {_lang_hits_sql('fr')},
    md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
),
feat AS (
  SELECT doc_id, source, fingerprint,
    CASE WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr AND h_en > 0 THEN 'en'
         WHEN h_es >= h_de AND h_es >= h_fr AND h_es > 0 THEN 'es'
         WHEN h_de >= h_fr AND h_de > 0 THEN 'de'
         WHEN h_fr > 0 THEN 'fr'
         ELSE 'unk' END AS lang_pred,
    ROUND((LEAST(n/20.0, 1.0)
         + LEAST(CASE WHEN n > 0 THEN CAST(hits AS DOUBLE)/n ELSE 0.0 END * 5.0, 1.0)
         + (1.0 - LEAST(CASE WHEN total > 0 THEN CAST(punct AS DOUBLE)/total ELSE 0.0 END * 4.0, 1.0)))/3.0,
      4) AS quality
  FROM t
),
kept AS (
  SELECT source, quality,
         ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM feat WHERE lang_pred = 'en' AND quality >= 0.5
)
SELECT source, COUNT(*) AS n_docs, ROUND(AVG(quality), 4) AS avg_quality
FROM kept WHERE rn = 1 GROUP BY source ORDER BY source
"""


SQL_GROUPING_SETS_SHARED = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority
"""


def q_a_grouping_sets(spark, sf_dir):
    """GROUPING SETS (beyond rollup/cube): one ANSI string shared
    verbatim with the oracle through the engine's SQL API. Plans as a
    single Expand + partial/final agg — one shuffle for all three
    grouping shapes."""
    Dataset(T(spark, sf_dir, "orders")).to_view("orders")
    return spark.sql(SQL_GROUPING_SETS_SHARED)


def q_f_histogram(spark, sf_dir):
    """Fixed-width histogram (profiling surface): engine-portable floor
    bucketing, one aggregate pass."""
    from dataprocessingframework_spark.operators.profiling import histogram

    return histogram(
        T(spark, sf_dir, "orders"), "o_totalprice",
        lo=0.0, hi=600_000.0, n_buckets=12,
    )


SQL_F_HISTOGRAM = """
WITH b AS (
  SELECT CASE WHEN o_totalprice < 0.0 THEN -1
              WHEN o_totalprice >= 600000.0 THEN 12
              ELSE CAST(FLOOR((o_totalprice - 0.0) / 50000.0) AS BIGINT)
         END AS bucket
  FROM orders)
SELECT bucket, ROUND(0.0 + bucket * 50000.0, 4) AS bucket_lo,
       ROUND(0.0 + (bucket + 1) * 50000.0, 4) AS bucket_hi,
       COUNT(*) AS cnt
FROM b GROUP BY bucket ORDER BY bucket
"""


def q_dd_jaccard_ngram(spark, sf_dir):
    """Character-4-gram shingle Jaccard near-dup (beyond reference):
    robust to word-boundary edits that break word-set Jaccard. Same
    inverted-index join shape as dd_jaccard; shingle generation is
    JVM-side codegen (sequence/transform/substring), no Python."""
    return dedup.jaccard_pairs(
        T(spark, sf_dir, "documents"), "text", "doc_id",
        threshold=0.4, ngram=4,
    ).orderBy("id_a", "id_b")


SQL_DD_JACCARD_NGRAM = """
WITH grams AS (
  SELECT DISTINCT d.doc_id, substr(d.text, i.i, 4) AS gram
  FROM documents d
  CROSS JOIN LATERAL (SELECT unnest(generate_series(1,
      greatest(length(d.text)-3, 0))) AS i) i
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ix
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(CAST(ix AS DOUBLE) / (sa.n + sb.n - ix), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(ix AS DOUBLE) / (sa.n + sb.n - ix) >= 0.4
ORDER BY id_a, id_b
"""


def q_w_jsonl_roundtrip(spark, sf_dir):
    """JSONL sink/source round-trip (beyond reference; CSV/parquet are
    its only table formats, `connectors/connector.py:66-90`): write
    documents as .jsonl parts, re-read with an explicit schema (one
    pass, no inference), aggregate — round-trip identity."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    out = f"/root/repo/.scratch/jsonl_{uuid.uuid4().hex[:8]}"
    try:
        docs = T(spark, sf_dir, "documents")
        write_jsonl(docs, out, max_records_per_file=200)
        back = read_jsonl(spark, out, schema=docs.schema)
        res = (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n_chars").alias("sum_chars"),
            )
            .orderBy("lang")
        )
        # materialize the (tiny) aggregate durably before the scratch
        # dir is deleted — a cache() could be evicted and re-scan a
        # directory that no longer exists
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_W_JSONL_ROUNDTRIP = """
SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_w_convert_formats(spark, sf_dir):
    """W3 convert-format chain across every supported table format:
    documents parquet -> ORC -> CSV (quote-all, explicit schema back)
    -> aggregate. Round-trip identity through the row-major AND the
    second columnar format; each hop is a map-only scan-to-write
    plan."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.formats import (
        convert_format,
        read_table,
        write_table,
    )

    base = f"/root/repo/.scratch/fmt_{uuid.uuid4().hex[:8]}"
    try:
        docs = T(spark, sf_dir, "documents")
        write_table(docs, f"{base}/orc", "orc", max_records_per_file=200)
        convert_format(
            spark, f"{base}/orc", f"{base}/csv", "orc", "csv",
            max_records_per_file=200,
        )
        back = read_table(spark, f"{base}/csv", "csv", schema=docs.schema)
        res = (
            back.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n_chars").alias("sum_chars"),
                F.sum(F.length("text")).alias("sum_text_chars"),
            )
            .orderBy("source")
        )
        # materialize before deleting scratch (cache could be evicted)
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_W_CONVERT_FORMATS = """
SELECT source, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_chars
FROM documents GROUP BY source ORDER BY source
"""


def q_a_approx_sketches(spark, sf_dir):
    """Sketch aggregates for 100 TB profiling: HLL++ distinct counts
    and quantile sketches run in ONE map-side-combinable pass with
    KB-sized state, where exact distinct/percentile would shuffle the
    full column. Sketch estimates are engine-specific by design
    (DuckDB's HLL gives different values), so the cross-engine oracle
    checks the PORTABLE half: the exact twins value-match DuckDB, and
    each approximate value collapses to a within-error-bound boolean
    (rsd=0.05 -> 3-sigma 15% for HLL; 2% value tolerance for the
    rank-1e-4 quantile sketch) that the oracle pins to TRUE. A false
    boolean therefore shows up as a hash mismatch — the error bound
    is driver-checked, not just pytest-checked."""
    li = T(spark, sf_dir, "lineitem")
    approx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.05).alias("ad_orderkey"),
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("ad_partkey"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias(
            "pct"
        ),
    )
    exact = li.agg(
        F.count_distinct("l_orderkey").alias("ed_orderkey"),
        F.count_distinct("l_partkey").alias("ed_partkey"),
        F.expr(
            "percentile(l_extendedprice, array(0.5, 0.95, 0.99))"
        ).alias("epct"),
    )
    err = lambda a, e: F.abs(F.col(a) - F.col(e)) / F.col(e)  # noqa: E731
    return (
        approx.crossJoin(F.broadcast(exact))
        .select(
            "ed_orderkey",
            "ed_partkey",
            F.round(F.col("epct")[0], 2).alias("p50_exact"),
            F.round(F.col("epct")[2], 2).alias("p99_exact"),
            (err("ad_orderkey", "ed_orderkey") <= 0.15).alias("ok_orderkey"),
            (err("ad_partkey", "ed_partkey") <= 0.15).alias("ok_partkey"),
            (
                F.abs(F.col("pct")[0] - F.col("epct")[0]) / F.col("epct")[0]
                <= 0.02
            ).alias("ok_p50"),
            (
                F.abs(F.col("pct")[2] - F.col("epct")[2]) / F.col("epct")[2]
                <= 0.02
            ).alias("ok_p99"),
        )
    )


SQL_A_APPROX_SKETCHES = """
SELECT COUNT(DISTINCT l_orderkey) AS ed_orderkey,
       COUNT(DISTINCT l_partkey) AS ed_partkey,
       ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS p50_exact,
       ROUND(quantile_cont(l_extendedprice, 0.99), 2) AS p99_exact,
       TRUE AS ok_orderkey, TRUE AS ok_partkey,
       TRUE AS ok_p50, TRUE AS ok_p99
FROM lineitem
"""


def q_stream_dedup(spark, sf_dir):
    """§2.12 stateful dedup surface, batch-checked: dropDuplicates on
    the key columns (streaming twin: dropDuplicatesWithinWatermark —
    see streaming/events.py stream_dedup). Projected to the key cols so
    the kept-row choice is deterministic."""
    from dataprocessingframework_spark.streaming import stream_dedup

    ev = T(spark, sf_dir, "events").select("user_id", "event_type")
    return stream_dedup(ev, ["user_id", "event_type"], ts_col=None).orderBy(
        "user_id", "event_type"
    )


SQL_STREAM_DEDUP = """
SELECT DISTINCT user_id, event_type FROM events
ORDER BY user_id, event_type
"""


# --------------------------------------------------------------------------
# round 4: event analytics (sessionize / retention / attribution /
# paths), interval windows, corpus mix & funnel reports, bigram
# profile, bucketed co-located join, full-outer merge, split assign
# --------------------------------------------------------------------------


def q_ev_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity closes a session):
    the canonical event-analytics operator the reference's batch
    surface lacks. Two windows over the SAME (user_id, ts, event_id)
    ordering — lag to flag session starts, running sum to number them
    — so Spark plans ONE shuffle on user_id and both windows run in
    the same sort. At 100 TB: partition count scales with users, no
    global sort, skewed users AQE-splittable."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("long")
    prev = F.lag(epoch).over(w)
    is_new = F.when(
        prev.isNull() | ((epoch - prev) > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            is_new.alias("is_new"),
        )
        .withColumn("session_id", F.sum("is_new").over(wc))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.max(F.col("ts").cast("long"))
                - F.min(F.col("ts").cast("long"))
            ).alias("dur_sec"),
            F.count_distinct("event_type").alias("n_types"),
        )
        .orderBy("user_id", "session_id")
    )


SQL_EV_SESSIONIZE = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CAST(SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM o
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       date_diff('second', MIN(ts), MAX(ts)) AS dur_sec,
       COUNT(DISTINCT event_type) AS n_types
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def q_ev_retention(spark, sf_dir):
    """Weekly cohort retention matrix (cohort week x weeks-since),
    distinct users — the product-analytics staple. Cohort derivation
    is a user-keyed agg joined back; both shuffles are user-sized,
    never event-sized."""
    ev = T(spark, sf_dir, "events")
    per = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("week")
    )
    cohort = per.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        per.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


SQL_EV_RETENTION = """
WITH per AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
), coh AS (
  SELECT user_id, MIN(week) AS cohort_week FROM per GROUP BY user_id
)
SELECT cohort_week,
       CAST(floor(date_diff('day', cohort_week, week) / 7) AS INTEGER)
         AS week_offset,
       COUNT(DISTINCT per.user_id) AS n_users
FROM per JOIN coh USING (user_id)
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


def q_ev_attribution(spark, sf_dir):
    """First-touch / last-touch attribution: per user the first and
    last event_type by (ts, event_id), then the user count per
    (first, last) pair. min_by/max_by over a lexicographic (ts,
    event_id) struct — ONE map-side-combinable aggregate instead of
    the window/self-join formulation (which plans 5 exchanges and
    sorts every user's events); per-user state is two structs, so the
    shuffle carries users, not events. The oracle keeps the
    row_number formulation — same result, independent derivation."""
    ev = T(spark, sf_dir, "events")
    ord_key = F.struct("ts", "event_id")
    per_user = ev.groupBy("user_id").agg(
        F.min_by("event_type", ord_key).alias("first_touch"),
        F.max_by("event_type", ord_key).alias("last_touch"),
    )
    return (
        per_user.groupBy("first_touch", "last_touch")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("first_touch", "last_touch")
    )


SQL_EV_ATTRIBUTION = """
WITH marked AS (
  SELECT user_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rf,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rl
  FROM events
)
SELECT f.event_type AS first_touch, l.event_type AS last_touch,
       COUNT(DISTINCT f.user_id) AS n_users
FROM marked f JOIN marked l
  ON f.user_id = l.user_id AND f.rf = 1 AND l.rl = 1
GROUP BY first_touch, last_touch
ORDER BY first_touch, last_touch
"""


def q_ev_top_paths(spark, sf_dir):
    """Top event-type transitions (src -> next) via lead() — the
    navigation-path profile. Deterministic top-20 tie-break."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("src"), F.asc("dst"))
        .limit(20)
    )


SQL_EV_TOP_PATHS = """
WITH t AS (
  SELECT event_type AS src,
    LEAD(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
)
SELECT src, dst, COUNT(*) AS n FROM t WHERE dst IS NOT NULL
GROUP BY src, dst ORDER BY n DESC, src, dst LIMIT 20
"""


def q_w_rolling_revenue(spark, sf_dir):
    """RANGE-interval window: per-customer trailing-90-day revenue on
    every order (RANGE frame over epoch seconds == DuckDB's
    INTERVAL-89-DAY frame for midnight-stamped dates). Range frames
    are the time-series surface ROWS frames can't express when order
    density varies per key."""
    od = T(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = (
        Window.partitionBy("o_custkey")
        # NTZ-safe epoch: NTZ -> TIMESTAMP -> long (a direct NTZ->long
        # cast is rejected); dates are midnight-stamped so the RANGE
        # frame matches DuckDB's INTERVAL 89 DAY exactly
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-89 * 86400, 0)
    )
    return (
        od.select(
            "o_custkey",
            F.to_date("o_orderdate").alias("o_date"),
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("rev_90d"),
        )
        .orderBy("o_custkey", "o_date", "o_orderkey")
    )


SQL_W_ROLLING_REVENUE = """
SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_date, o_orderkey,
  ROUND(SUM(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate
    RANGE BETWEEN INTERVAL 89 DAY PRECEDING AND CURRENT ROW), 2)
    AS rev_90d
FROM orders WHERE o_custkey % 100 = 0
ORDER BY o_custkey, o_date, o_orderkey
"""


def q_tx_lang_mix(spark, sf_dir):
    """Corpus language-mix report: docs, whitespace tokens, and doc
    share per declared language — the first table anyone asks of a
    multilingual corpus. Single agg pass + broadcast total."""
    docs = T(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text_analysis.token_count("text")).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_docs").alias("tot"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_docs") / F.col("tot"), 4).alias("doc_share"),
        )
        .orderBy("lang")
    )


SQL_TX_LANG_MIX = """
WITH per AS (
  SELECT lang, COUNT(*) AS n_docs,
    CAST(SUM(len(list_filter(string_split(text,' '), x -> x <> '')))
         AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
)
SELECT lang, n_docs, n_tokens,
       ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 4) AS doc_share
FROM per ORDER BY lang
"""


def q_tx_filter_funnel(spark, sf_dir):
    """Curation-funnel survival report: one conditional-aggregate pass
    emits how many docs survive each cumulative stage (length ->
    quality -> language -> exact near-dup). The operational 'where did
    my corpus go' query; all stages evaluate in ONE scan, the dedup
    stage is a conditional count-distinct on the fingerprint."""
    docs = T(spark, sf_dir, "documents")
    feat = docs.select(
        "n_chars",
        text_analysis.quality_score("text").alias("quality"),
        text_analysis.lang_id("text").alias("lang_pred"),
        text_analysis.fingerprint("text").alias("fingerprint"),
    )
    len_ok = F.col("n_chars") >= 200
    q_ok = len_ok & (F.col("quality") >= 0.5)
    en_ok = q_ok & (F.col("lang_pred") == "en")
    return feat.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(len_ok, 1)).alias("n_len"),
        F.count(F.when(q_ok, 1)).alias("n_quality"),
        F.count(F.when(en_ok, 1)).alias("n_english"),
        F.count_distinct(F.when(en_ok, F.col("fingerprint"))).alias(
            "n_dedup"
        ),
    )


SQL_TX_FILTER_FUNNEL = f"""
WITH t AS (
  SELECT doc_id, n_chars,
    len(list_filter(string_split(text,' '), x -> x <> '')) AS n,
    length(text) AS total,
    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
    len(list_filter(string_split(text,' '), x -> x IN ({_STOPS_SQL}))) AS hits,
    {_lang_hits_sql('en')},
    {_lang_hits_sql('es')},
    {_lang_hits_sql('de')},
    {_lang_hits_sql('fr')},
    md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
),
feat AS (
  SELECT n_chars, fingerprint,
    CASE WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr AND h_en > 0 THEN 'en'
         WHEN h_es >= h_de AND h_es >= h_fr AND h_es > 0 THEN 'es'
         WHEN h_de >= h_fr AND h_de > 0 THEN 'de'
         WHEN h_fr > 0 THEN 'fr'
         ELSE 'unk' END AS lang_pred,
    ROUND((LEAST(n/20.0, 1.0)
         + LEAST(CASE WHEN n > 0 THEN CAST(hits AS DOUBLE)/n ELSE 0.0 END * 5.0, 1.0)
         + (1.0 - LEAST(CASE WHEN total > 0 THEN CAST(punct AS DOUBLE)/total ELSE 0.0 END * 4.0, 1.0)))/3.0,
      4) AS quality
  FROM t
)
SELECT COUNT(*) AS n_all,
  COUNT(*) FILTER (WHERE n_chars >= 200) AS n_len,
  COUNT(*) FILTER (WHERE n_chars >= 200 AND quality >= 0.5) AS n_quality,
  COUNT(*) FILTER (WHERE n_chars >= 200 AND quality >= 0.5
                     AND lang_pred = 'en') AS n_english,
  COUNT(DISTINCT CASE WHEN n_chars >= 200 AND quality >= 0.5
                        AND lang_pred = 'en'
                      THEN fingerprint END) AS n_dedup
FROM feat
"""


def q_f_ngram_profile(spark, sf_dir):
    """Top-20 word bigrams (zip_with over adjacent token slices — no
    self-join): the n-gram corpus profile. Explode is the only wide
    op; counts combine map-side."""
    docs = T(spark, sf_dir, "documents")
    toks = F.expr("filter(split(lower(text), ' '), x -> x != '')")
    bi = (
        docs.select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1),"
                    " (a, b) -> concat(a, ' ', b))"
                )
            ).alias("bigram")
        )
    )
    return (
        bi.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("bigram"))
        .limit(20)
    )


SQL_F_NGRAM_PROFILE = """
WITH toks AS (
  SELECT list_filter(string_split(lower(text),' '), x -> x <> '') AS t
  FROM documents
), bi AS (
  SELECT unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM toks WHERE len(t) >= 2
)
SELECT bigram, COUNT(*) AS freq FROM bi GROUP BY bigram
ORDER BY freq DESC, bigram LIMIT 20
"""


def q_a_mode_per_group(spark, sf_dir):
    """Per-source modal language (mode with deterministic tie-break) —
    group-by + one window over group-sized data, never row-sized."""
    docs = T(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    cnt = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(
        F.desc("n"), F.asc_nulls_last("lang")
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("mode_lang"), "n")
        .orderBy("source")
    )


SQL_A_MODE_PER_GROUP = """
WITH cnt AS (
  SELECT source, lang, COUNT(*) AS n FROM documents
  WHERE lang IS NOT NULL GROUP BY source, lang
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY n DESC, lang ASC NULLS LAST) AS rn
  FROM cnt
)
SELECT source, lang AS mode_lang, n FROM ranked WHERE rn = 1
ORDER BY source
"""


def q_w_bucketed_join(spark, sf_dir):
    """Bucketed co-located join: orders and customer written bucketed
    by custkey (8 buckets, sorted), then joined WITHOUT an exchange on
    either side — the pre-shuffle layout that turns every future join
    on the key into a map-side merge. At 100 TB this is the difference
    between shuffling the fact table per query and shuffling it once
    at ingest. tests/test_bucketed.py pins the no-Exchange plan; here
    the result feeds the driver oracle."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.bucketed import (
        write_bucketed,
    )

    tag = uuid.uuid4().hex[:8]
    ot, ct = f"orders_b_{tag}", f"customer_b_{tag}"
    base = f"/root/repo/.scratch/bucketed_{tag}"
    try:
        # write_bucketed (not raw bucketBy): one file per bucket —
        # see PLANS.md "r8 ANN probe soak" finding 1
        write_bucketed(
            T(spark, sf_dir, "orders"), ot, "o_custkey",
            num_buckets=8, sort_cols="o_custkey", path=f"{base}/{ot}",
        )
        write_bucketed(
            T(spark, sf_dir, "customer"), ct, "c_custkey",
            num_buckets=8, sort_cols="c_custkey", path=f"{base}/{ct}",
        )
        res = (
            spark.table(ot)
            .join(
                spark.table(ct),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            )
            .orderBy("c_mktsegment")
        )
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {ct}")
        shutil.rmtree(base, ignore_errors=True)


SQL_W_BUCKETED_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_j_full_outer(spark, sf_dir):
    """Full-outer merge of two daily aggregates (orders vs events) —
    the reconciliation-report join shape; unmatched days survive from
    BOTH sides with zero-filled counts."""
    od = (
        T(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ed = (
        T(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        od.join(ed, "d", "full_outer")
        .select(
            "d",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        .orderBy("d")
    )


SQL_J_FULL_OUTER = """
WITH od AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
  FROM orders GROUP BY d
), ed AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_events
  FROM events GROUP BY d
)
SELECT COALESCE(od.d, ed.d) AS d,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(n_events, 0) AS n_events
FROM od FULL JOIN ed ON od.d = ed.d
ORDER BY d
"""


def q_d_split_assign(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test assignment on the portable
    key hash — the reproducible-split primitive (hash_sample's named
    sibling): disjoint, covering, engine-portable, shuffle-free."""
    from dataprocessingframework_spark.operators.sampling import split_assign

    return (
        split_assign(T(spark, sf_dir, "documents"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split")
    )


SQL_D_SPLIT_ASSIGN = """
WITH s AS (
  SELECT doc_id,
    CASE WHEN h < 90 THEN 'train'
         WHEN h < 95 THEN 'val'
         ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
      CAST(concat('0x',
        substr(md5(concat('split', CAST(doc_id AS VARCHAR))),1,15))
        AS BIGINT) % 100 AS h
    FROM documents) t
)
SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id,
       MAX(doc_id) AS max_id
FROM s GROUP BY split ORDER BY split
"""


def q_ev_anomaly_days(spark, sf_dir):
    """Outlier days by z-score (daily total value vs the corpus mean):
    the monitoring query. Global stats come from ONE aggregate
    broadcast back over the (already day-sized) daily table."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.round(F.sum("value"), 2).alias("total")
    )
    stats = daily.agg(
        F.avg("total").alias("mu"), F.stddev_pop("total").alias("sd")
    )
    return (
        daily.crossJoin(F.broadcast(stats))
        .select(
            "d",
            "total",
            F.round(
                F.abs(F.col("total") - F.col("mu")) / F.col("sd"), 4
            ).alias("z"),
        )
        .orderBy(F.desc("z"), F.asc("d"))
        .limit(10)
    )


SQL_EV_ANOMALY_DAYS = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, ROUND(SUM(value), 2) AS total
  FROM events GROUP BY d
), stats AS (
  SELECT AVG(total) AS mu, stddev_pop(total) AS sd FROM daily
)
SELECT d, total, ROUND(ABS(total - mu) / sd, 4) AS z
FROM daily CROSS JOIN stats
ORDER BY z DESC, d LIMIT 10
"""


def q_ev_quartiles_by_type(spark, sf_dir):
    """Exact grouped quantiles (per event_type): the grouped twin of
    a1_quartiles; interpolating percentile == DuckDB quantile_cont."""
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(value, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.75)"), 4).alias("p75"),
        )
        .orderBy("event_type")
    )


SQL_EV_QUARTILES_BY_TYPE = """
SELECT event_type, COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.25), 4) AS p25,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.75), 4) AS p75
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_tx_keyword_search(spark, sf_dir):
    """Term search ranked by term frequency — the corpus-search
    primitive (inverted-index probe shape): per-row token counts are
    narrow array expressions, ranking is a distributed TakeOrdered
    top-25, never a global sort."""
    docs = T(spark, sf_dir, "documents")
    toks = text_analysis.tokens("text")
    hits = F.size(F.filter(toks, lambda x: x == F.lit("join")))
    return (
        docs.select(
            "doc_id",
            hits.alias("hits"),
            F.round(hits / F.size(toks), 4).alias("tf"),
        )
        .filter(F.col("hits") > 0)
        .orderBy(F.desc("tf"), F.desc("hits"), F.asc("doc_id"))
        .limit(25)
    )


SQL_TX_KEYWORD_SEARCH = """
WITH t AS (
  SELECT doc_id,
    len(list_filter(string_split(text,' '), x -> x = 'join')) AS hits,
    len(list_filter(string_split(text,' '), x -> x <> '')) AS n
  FROM documents
)
SELECT doc_id, hits, ROUND(CAST(hits AS DOUBLE) / n, 4) AS tf
FROM t WHERE hits > 0
ORDER BY tf DESC, hits DESC, doc_id LIMIT 25
"""


def q_w_merge_upsert(spark, sf_dir):
    """MERGE/upsert semantics as a full-outer coalesce: a changes
    batch (updates for key%7 rows, inserts above the snapshot's key
    space) applied to the snapshot — matched rows take the change,
    unmatched keep the snapshot, new keys append. ONE shuffle family
    on the merge key; at 100 TB the same plan bucket-joins if the
    snapshot is bucketed by key (w_bucketed_join layout)."""
    snap = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    # +10.0 (not a multiplier): a multiplicative bump lands updated
    # prices on half-cent rounding boundaries where double-rounding
    # diverges across engines; an additive delta preserves the 2dp
    # values exactly in both
    updates = snap.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("new_status"),
        (F.col("o_totalprice") + 10.0).alias("new_price"),
    )
    inserts = snap.filter(F.col("o_orderkey") % 11 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.lit("N").alias("new_status"),
        F.col("o_totalprice").alias("new_price"),
    )
    changes = updates.unionByName(inserts)
    return (
        snap.join(changes, "o_orderkey", "full_outer")
        .select(
            "o_orderkey",
            F.coalesce("new_status", "o_orderstatus").alias("status"),
            F.coalesce("new_price", "o_totalprice").alias("price"),
        )
        .orderBy("o_orderkey")
    )


SQL_W_MERGE_UPSERT = """
WITH snap AS (
  SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders
), changes AS (
  SELECT o_orderkey, 'U' AS new_status,
         o_totalprice + 10.0 AS new_price
  FROM snap WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, 'N', o_totalprice
  FROM snap WHERE o_orderkey % 11 = 0
)
SELECT COALESCE(s.o_orderkey, c.o_orderkey) AS o_orderkey,
       COALESCE(new_status, o_orderstatus) AS status,
       COALESCE(new_price, o_totalprice) AS price
FROM snap s FULL JOIN changes c ON s.o_orderkey = c.o_orderkey
ORDER BY o_orderkey
"""


def q_a_top_docs_per_source(spark, sf_dir):
    """Ordered string aggregation: the 3 largest docs per source as a
    comma-joined id list (rank-sorted structs -> array_sort ->
    array_join, so the aggregation order is deterministic without any
    global sort) — the grouped-top-k presentation shape."""
    docs = T(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "rn",
                                F.col("doc_id").cast("string").alias("s"),
                            )
                        )
                    ),
                    lambda x: x["s"],
                ),
                ",",
            ).alias("top_docs"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


SQL_A_TOP_DOCS_PER_SOURCE = """
WITH ranked AS (
  SELECT source, doc_id, n_chars,
    ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
SELECT source,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn) AS top_docs,
       MAX(n_chars) AS max_chars
FROM ranked WHERE rn <= 3
GROUP BY source ORDER BY source
"""


def q_ev_props_json(spark, sf_dir):
    """JSON property analytics: extract a typed field from the raw
    props JSON string per event (get_json_object — JVM-side JSON path,
    no UDF) and aggregate per event_type. The semi-structured-column
    surface."""
    ev = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_EV_PROPS_JSON = """
SELECT event_type, COUNT(k) AS n, ROUND(AVG(k), 4) AS avg_k,
       MAX(k) AS max_k
FROM (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events) t
GROUP BY event_type ORDER BY event_type
"""


def q_tx_ngram_entropy(spark, sf_dir):
    """Corpus unigram/bigram Shannon entropy (bits) — the
    information-density health metric that pairs with tx_zipf: low
    entropy flags templated/duplicated corpora. Two explode+agg
    passes; the p·log2(p) fold runs over gram-cardinality rows."""
    docs = T(spark, sf_dir, "documents")
    toks = F.expr("filter(split(lower(text), ' '), x -> x != '')")
    uni = (
        docs.select(F.explode(toks).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        docs.select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1),"
                    " (a, b) -> concat(a, ' ', b))"
                )
            ).alias("g")
        )
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def entropy(cnt):
        tot = cnt.agg(F.sum("c").alias("tot"))
        return cnt.crossJoin(F.broadcast(tot)).agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                -F.sum(
                    (F.col("c") / F.col("tot"))
                    * F.log2(F.col("c") / F.col("tot"))
                ),
                4,
            ).alias("h_bits"),
        )

    u = entropy(uni).select(
        F.col("n_grams").alias("n_unigrams"),
        F.col("h_bits").alias("h_unigram"),
    )
    b = entropy(bi).select(
        F.col("n_grams").alias("n_bigrams"),
        F.col("h_bits").alias("h_bigram"),
    )
    return u.crossJoin(b)


SQL_TX_NGRAM_ENTROPY = """
WITH toks AS (
  SELECT list_filter(string_split(lower(text),' '), x -> x <> '') AS t
  FROM documents
), uni AS (
  SELECT g, COUNT(*) AS c FROM (SELECT unnest(t) AS g FROM toks) GROUP BY g
), bi AS (
  SELECT g, COUNT(*) AS c FROM (
    SELECT unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i+1])) AS g
    FROM toks WHERE len(t) >= 2) GROUP BY g
),
ue AS (
  SELECT COUNT(*) AS n_unigrams,
    ROUND(-SUM((CAST(c AS DOUBLE)/tot) * log2(CAST(c AS DOUBLE)/tot)), 4)
      AS h_unigram
  FROM uni CROSS JOIN (SELECT SUM(c) AS tot FROM uni)
),
be AS (
  SELECT COUNT(*) AS n_bigrams,
    ROUND(-SUM((CAST(c AS DOUBLE)/tot) * log2(CAST(c AS DOUBLE)/tot)), 4)
      AS h_bigram
  FROM bi CROSS JOIN (SELECT SUM(c) AS tot FROM bi)
)
SELECT n_unigrams, h_unigram, n_bigrams, h_bigram FROM ue CROSS JOIN be
"""


def q_f_regex_extract_all(spark, sf_dir):
    """regexp_extract_all surface: pull the digit run out of every
    customer name and reconcile it against the key — the
    data-consistency audit shape (extraction is a narrow JVM regex,
    the report is one aggregate)."""
    cust = T(spark, sf_dir, "customer")
    extracted = F.expr(
        "CAST(regexp_extract_all(c_name, '[0-9]+', 0)[0] AS BIGINT)"
    )
    return cust.select(
        (extracted == F.col("c_custkey")).alias("ok")
    ).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("ok"), 1)).alias("n_match"),
    )


SQL_F_REGEX_EXTRACT_ALL = """
SELECT COUNT(*) AS n_total,
       COUNT(*) FILTER (
         WHERE CAST(regexp_extract_all(c_name, '[0-9]+')[1] AS BIGINT)
               = c_custkey) AS n_match
FROM customer
"""


def q_a_skew_report(spark, sf_dir):
    """Join-key skew diagnostics on l_orderkey: distinct keys, max and
    mean per-key frequency, heaviest key's share — the profiling query
    that predicts shuffle-skew BEFORE a 100 TB join is attempted (its
    verdict decides salting / AQE skew-join settings)."""
    cnt = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cnt.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_freq"),
        F.round(F.avg("c"), 4).alias("avg_freq"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top1_share"),
    )


SQL_A_SKEW_REPORT = """
WITH cnt AS (
  SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY l_orderkey
)
SELECT COUNT(*) AS n_keys, MAX(c) AS max_freq,
       ROUND(AVG(c), 4) AS avg_freq,
       ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top1_share
FROM cnt
"""


def q_ev_transition_latency(spark, sf_dir):
    """Mean seconds between consecutive events per (src -> dst)
    transition — ev_top_paths with timing: the funnel-latency
    profile. Same single user_id window family."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("long")
    t = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
        (F.lead(epoch).over(w) - epoch).alias("gap_sec"),
    ).filter(F.col("dst").isNotNull())
    return (
        t.groupBy("src", "dst")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("gap_sec"), 4).alias("avg_gap_sec"),
        )
        .orderBy("src", "dst")
    )


SQL_EV_TRANSITION_LATENCY = """
WITH t AS (
  SELECT event_type AS src,
    LEAD(event_type) OVER w AS dst,
    date_diff('second', ts, LEAD(ts) OVER w) AS gap_sec
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT src, dst, COUNT(*) AS n, ROUND(AVG(gap_sec), 4) AS avg_gap_sec
FROM t WHERE dst IS NOT NULL
GROUP BY src, dst ORDER BY src, dst
"""


def q_w_distribution_ranks(spark, sf_dir):
    """Distribution-rank window family (percent_rank, cume_dist,
    ntile) per order priority over a fully-determined ordering
    (totalprice, orderkey — ties broken so ntile is cross-engine
    deterministic). Output bounded to the custkey%200 slice."""
    od = T(spark, sf_dir, "orders").filter(F.col("o_custkey") % 200 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        od.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 4).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_orderkey")
    )


SQL_W_DISTRIBUTION_RANKS = """
SELECT o_orderkey, o_orderpriority,
  ROUND(percent_rank() OVER w, 4) AS pct_rank,
  ROUND(cume_dist() OVER w, 4) AS cume,
  CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM orders
WHERE o_custkey % 200 = 0
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
"""


def q_tx_dup_family_sizes(spark, sf_dir):
    """Duplicate-family size histogram: how much of the corpus sits in
    exact-dup families of size k (fingerprint groupBy -> size
    histogram) — the dedup-planning metric that sizes the win BEFORE
    running removal. Two group-bys, second over family-cardinality
    rows."""
    docs = T(spark, sf_dir, "documents")
    fams = (
        docs.select(text_analysis.fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("family_size"))
    )
    return (
        fams.groupBy("family_size")
        .agg(
            F.count(F.lit(1)).alias("n_families"),
            F.sum("family_size").alias("n_docs"),
        )
        .orderBy("family_size")
    )


SQL_TX_DUP_FAMILY_SIZES = """
WITH fams AS (
  SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
         COUNT(*) AS family_size
  FROM documents GROUP BY fp
)
SELECT family_size, COUNT(*) AS n_families,
       CAST(SUM(family_size) AS BIGINT) AS n_docs
FROM fams GROUP BY family_size ORDER BY family_size
"""


def q_j_fuzzy_match(spark, sf_dir):
    """Blocked fuzzy string join: corrupted probe terms (deterministic
    first-char drop of the 20 most frequent words) matched back to the
    corpus vocabulary by levenshtein <= 2 — the vocabulary-repair /
    entity-resolution shape. The theta condition evaluates only inside
    a length band (|len diff| <= 2) with the tiny probe side
    broadcast, so the candidate space is banded, never vocabulary x
    probes."""
    docs = T(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(text_analysis.tokens("text")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    probes = (
        vocab.orderBy(F.desc("freq"), F.asc("term"))
        .limit(20)
        .filter(F.length("term") >= 3)
        .select(F.expr("substr(term, 2)").alias("probe"))
        .distinct()
    )
    cand = vocab.join(
        F.broadcast(probes),
        (
            F.abs(F.length("term") - F.length("probe")) <= 2
        )
        & (F.levenshtein("term", "probe") <= 2),
    )
    return (
        cand.select(
            "probe",
            "term",
            F.levenshtein("term", "probe").alias("dist"),
            "freq",
        )
        .orderBy("probe", "term")
    )


SQL_J_FUZZY_MATCH = """
WITH vocab AS (
  SELECT term, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(string_split(text,' '), x -> x <> ''))
      AS term
    FROM documents) t
  GROUP BY term
), probes AS (
  SELECT DISTINCT substr(term, 2) AS probe FROM (
    SELECT term FROM vocab ORDER BY freq DESC, term LIMIT 20)
  WHERE length(term) >= 3
)
SELECT probe, term, levenshtein(term, probe) AS dist, freq
FROM vocab JOIN probes
  ON abs(length(term) - length(probe)) <= 2
 AND levenshtein(term, probe) <= 2
ORDER BY probe, term
"""


def q_ev_rolling_distinct_users(spark, sf_dir):
    """Rolling 7-day distinct users per day (the WAU metric): exact
    windowed count-distinct via the (day, user) DISTINCT table joined
    to its 7-day horizon — shuffle volume is |daily actives| x 7, not
    events x 7, and never a per-row distinct window (which Spark
    rightly refuses)."""
    ev = T(spark, sf_dir, "events")
    daily = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = daily.select("d").distinct().select(F.col("d").alias("d2"))
    return (
        daily.join(
            days,
            (F.col("d") <= F.col("d2"))
            & (F.col("d") >= F.date_sub(F.col("d2"), 6)),
        )
        .groupBy(F.col("d2").alias("d"))
        .agg(F.count_distinct("user_id").alias("wau"))
        .orderBy("d")
    )


SQL_EV_ROLLING_DISTINCT_USERS = """
WITH daily AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
), days AS (SELECT DISTINCT d AS d2 FROM daily)
SELECT d2 AS d, COUNT(DISTINCT user_id) AS wau
FROM daily JOIN days ON d <= d2 AND d >= d2 - INTERVAL 6 DAY
GROUP BY d2 ORDER BY d
"""


def q_a_sketch_union(spark, sf_dir):
    """Mergeable-sketch architecture (DataSketches HLL): per-source
    sketches built in one partial-aggregated pass, UNIONED to a global
    distinct estimate — the 100 TB profiling pattern where sketches
    are stored per partition/day and merged at query time instead of
    rescanning history. Oracle pattern as a_approx_sketches: the exact
    twin value-matches DuckDB, the estimate collapses to a
    within-error boolean (default lgConfigK=12 -> ~1.6% rse; 5%
    bound)."""
    docs = T(spark, sf_dir, "documents")
    fp = text_analysis.fingerprint("text")
    sk = (
        docs.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(F.hll_sketch_agg("fp").alias("sk"))
    )
    merged = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    # n_sources via count_distinct (null-excluded) to match the
    # oracle's COUNT(DISTINCT source) even if a null source appears
    exact = docs.agg(
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct(fp).alias("exact_global"),
    )
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_sources",
        "exact_global",
        (
            F.abs(F.col("est") - F.col("exact_global"))
            / F.col("exact_global")
            <= 0.05
        ).alias("ok_global"),
    )


SQL_A_SKETCH_UNION = """
SELECT COUNT(DISTINCT source) AS n_sources,
       COUNT(DISTINCT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')))
         AS exact_global,
       TRUE AS ok_global
FROM documents
"""


def q_graph_pagerank(spark, sf_dir):
    """Weighted PageRank over the event-transition graph (10 fixed
    iterations, damping 0.85): which event types accumulate
    navigational mass. Fixed iteration count keeps the result
    deterministic, so the DuckDB oracle replays the identical
    recurrence through chained CTEs — the iterative-algorithm tier's
    full-oracle representative (k-means stays invariant-checked)."""
    from dataprocessingframework_spark.operators.graph import pagerank

    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank(edges, weight="w").orderBy("node")


def _pagerank_sql(iterations: int = 10, damping: float = 0.85) -> str:
    """Chained-CTE DuckDB replay of the exact pagerank() recurrence."""
    head = """
WITH edges AS (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM (
    SELECT event_type AS src,
      LEAD(event_type) OVER (
        PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events) t
  WHERE dst IS NOT NULL GROUP BY src, dst
),
nodes AS (SELECT DISTINCT node FROM (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
out_w AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
norm AS (SELECT src, dst, w/ow AS nw FROM edges JOIN out_w USING (src)),
r0 AS (SELECT node, 1.0/n AS rank FROM nodes CROSS JOIN nn)"""
    parts = [head]
    for i in range(iterations):
        prev, cur = f"r{i}", f"r{i + 1}"
        # MATERIALIZED: each rank CTE is referenced twice (contrib +
        # dangling); inlining would square the plan per iteration —
        # the DuckDB twin of the Spark side's per-iteration checkpoint
        parts.append(
            f""",
{cur} AS MATERIALIZED (
  SELECT nodes.node,
    (1 - {damping})/nn.n
      + {damping} * (COALESCE(c.contrib, 0) + dang.d/nn.n) AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN (
    SELECT norm.dst AS node, SUM(r.rank * norm.nw) AS contrib
    FROM norm JOIN {prev} r ON r.node = norm.src GROUP BY norm.dst) c
    ON c.node = nodes.node
  CROSS JOIN (
    SELECT COALESCE(SUM(r.rank), 0) AS d
    FROM {prev} r LEFT JOIN out_w ON out_w.src = r.node
    WHERE out_w.src IS NULL) dang
)"""
        )
    parts.append(
        f"\nSELECT node, ROUND(rank, 6) AS rank FROM r{iterations} "
        "ORDER BY node"
    )
    return "".join(parts)


SQL_GRAPH_PAGERANK = _pagerank_sql()


def q_w_zorder_layout(spark, sf_dir):
    """Z-order layout round-trip: lineitem written Morton-ordered on
    (l_orderkey, l_partkey), re-read with predicates on BOTH columns
    (each prunes via footer min/max — the multi-column data-skipping
    layout), aggregated. Oracle = the same predicate aggregate on the
    unmoved source table."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.layout import (
        write_zorder_layout,
    )

    out = f"/root/repo/.scratch/zorder_{uuid.uuid4().hex[:8]}"
    li = T(spark, sf_dir, "lineitem")
    try:
        write_zorder_layout(
            li.select("l_orderkey", "l_partkey", "l_quantity"),
            out,
            ["l_orderkey", "l_partkey"],
            num_files=16,
        )
        back = spark.read.parquet(out).filter(
            (F.col("l_orderkey") < 1000) & (F.col("l_partkey") < 100)
        )
        res = back.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_W_ZORDER_LAYOUT = """
SELECT COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem WHERE l_orderkey < 1000 AND l_partkey < 100
"""


def q_stream_sessionize(spark, sf_dir):
    """§2.12 custom stateful operator, batch-checked: the
    applyInPandasWithState gap-sessionizer's batch twin (identical
    close rule, gap > 1800s). The streaming body — keyed state, append
    emission on close, event-time timeout for the final open session —
    runs in tests/test_video_and_stateful.py with a real two-batch
    readStream."""
    from dataprocessingframework_spark.streaming import stateful_sessionize

    return stateful_sessionize(T(spark, sf_dir, "events")).orderBy(
        "user_id", "session_start"
    )


SQL_STREAM_SESSIONIZE = """
WITH o AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *, CAST(SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM o
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
       CAST(floor(epoch(MAX(ts))) AS BIGINT) AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def q_dd_source_overlap(spark, sf_dir):
    """Pairwise source-level vocabulary Jaccard — the cross-corpus
    contamination/similarity matrix. The self-join runs on the
    DISTINCT (source, token) table, so its volume is vocabulary-sized,
    never corpus-sized; output is sources², tiny at any scale."""
    docs = T(spark, sf_dir, "documents")
    st = docs.select(
        "source", F.explode(text_analysis.tokens("text")).alias("tok")
    ).distinct()
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        st.alias("a")
        .join(st.alias("b"), "tok")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("src_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("source").alias("src_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


SQL_DD_SOURCE_OVERLAP = """
WITH st AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
), sizes AS (
  SELECT source, COUNT(*) AS n FROM st GROUP BY source
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_common,
       ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4)
         AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
ORDER BY src_a, src_b
"""


# --------------------------------------------------------------------------
# round 4 additions: bloom-prefiltered decontamination, sliding-window
# document chunking, weighted sampling without replacement, snapshot
# diff, near-dup cluster representatives
# --------------------------------------------------------------------------


def q_tx_bloom_decontaminate(spark, sf_dir):
    """Bloom-prefiltered benchmark decontamination: EXACT same answer
    as tx_decontaminate (Bloom filters have no false negatives and an
    exact verify join kills false positives), but the benchmark side
    is broadcast as ~2^18 bit positions instead of gram strings — the
    shape that survives a benchmark set too big to broadcast. Shares
    tx_decontaminate's oracle for that reason."""
    docs = T(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return text_analysis.bloom_decontaminate(
        corpus, bench, n=3, threshold=5, bits_log2=18, num_hash=2
    ).orderBy("doc_id")


SQL_TX_BLOOM_DECONTAMINATE = SQL_TX_DECONTAMINATE


def q_tx_chunk_windows(spark, sf_dir):
    """Sliding-window document chunking (window=32 tokens, stride=24):
    the context-length shaper for LLM training/RAG ingestion. One
    narrow projection + posexplode — chunk boundaries are pure
    per-row arithmetic, so the operator is map-only at any corpus
    size; no shuffle until a downstream consumer asks for one."""
    from dataprocessingframework_spark.operators.text_analysis import (
        chunk_windows,
    )

    return (
        chunk_windows(
            T(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000),
            window=32,
            stride=24,
        )
        .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
        .orderBy("doc_id", "chunk_id")
    )


SQL_TX_CHUNK_WINDOWS = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents WHERE doc_id < 2000
), starts AS (
  SELECT doc_id, t, unnest(generate_series(1, GREATEST(len(t), 1), 24)) AS s
  FROM toks
)
SELECT doc_id,
       CAST((s - 1) // 24 AS BIGINT) AS chunk_id,
       array_to_string(t[s:s+31], ' ') AS chunk_text,
       CAST(LEAST(len(t) - s + 1, 32) AS INT) AS n_tokens
FROM starts
WHERE s = 1 OR s <= len(t)
ORDER BY doc_id, chunk_id
"""


def q_d_weighted_sample(spark, sf_dir):
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES, public algorithm): top-k docs by key = -ln(u)/w with u a
    portable md5-derived uniform and w = n_chars, so long docs are
    proportionally likelier but every selection is deterministic and
    engine-portable. Spark plans TakeOrderedAndProject — per-partition
    top-k then a k-row merge, never a global sort."""
    from dataprocessingframework_spark.operators.sampling import (
        weighted_sample,
    )

    return (
        weighted_sample(
            T(spark, sf_dir, "documents"),
            weight_col="n_chars",
            id_col="doc_id",
            k=100,
        )
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


SQL_D_WEIGHTED_SAMPLE = """
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         -ln((CAST(concat('0x', substr(md5(concat('ws|',
              CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000007
              + 1.0) / 1000000008.0) / n_chars AS k
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, source, n_chars FROM keyed
ORDER BY k LIMIT 100
"""


def q_w_snapshot_diff(spark, sf_dir):
    """Dataset-versioning diff between two snapshots (added / removed
    / changed rows + equality hash check on the compare columns): the
    audit primitive behind incremental corpus releases. Synthesized
    snapshots: OLD drops doc_id%11==0, NEW drops doc_id%13==0 and
    rewrites text for doc_id%7==0. One full-outer equi-join on the
    key — at 100 TB both sides hash-partition on doc_id and AQE
    handles skew; nothing is broadcast or collected."""
    from dataprocessingframework_spark.operators.versioning import (
        snapshot_diff,
    )

    docs = T(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 11 != 0)
    new = (
        docs.filter(F.col("doc_id") % 13 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0, F.upper(F.col("text"))
            ).otherwise(F.col("text")),
        )
    )
    return (
        snapshot_diff(old, new, key_cols=["doc_id"], compare_cols=["text"])
        .filter(F.col("status") != "unchanged")
        .orderBy("doc_id")
    )


SQL_W_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 0
), new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
WHERE (CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
            ELSE 'unchanged' END) <> 'unchanged'
ORDER BY doc_id
"""


def q_dd_cluster_representatives(spark, sf_dir):
    """Near-dup cluster representative selection: the `keep best, drop
    rest` step that follows every dedup clustering in a training-data
    pipeline. Reuses the verified Jaccard>=0.8 edges -> connected
    components composition (dd_clusters), then ONE window over
    cluster_id keeps the best doc (max n_chars, doc_id tiebreak).
    Adds a single cluster-keyed window on top of the clustering — no
    new scale surface."""
    docs = T(spark, sf_dir, "documents")
    edges = dedup.jaccard_pairs(docs, "text", "doc_id", threshold=0.8)
    cc = dedup.connected_components(
        edges, all_nodes=docs.select("doc_id"), id_a="id_a", id_b="id_b"
    )
    ranked = cc.select(
        F.col("node").alias("doc_id"), F.col("cluster").alias("cluster_id")
    ).join(docs.select("doc_id", "n_chars"), on="doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", "doc_id", "n_chars")
        .orderBy("cluster_id")
    )


SQL_DD_CLUSTER_REPRESENTATIVES = """
WITH RECURSIVE
words AS (SELECT DISTINCT doc_id, w FROM
  (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) t
  WHERE w <> ''),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
edges AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8),
bidir AS (SELECT id_a AS src, id_b AS dst FROM edges
          UNION ALL SELECT id_b, id_a FROM edges),
cc AS (
  SELECT doc_id, doc_id AS label FROM documents
  UNION
  SELECT b.dst AS doc_id, LEAST(cc.label, b.dst) AS label
  FROM cc JOIN bidir b ON cc.doc_id = b.src
),
clusters AS (SELECT doc_id, MIN(label) AS cluster_id FROM cc GROUP BY doc_id),
ranked AS (
  SELECT c.cluster_id, d.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, d.doc_id) AS rn
  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
)
SELECT cluster_id, doc_id, n_chars FROM ranked WHERE rn = 1
ORDER BY cluster_id
"""


def q_j_nearest(spark, sf_dir):
    """Nearest-in-time join (bidirectional as-of): for each click, the
    purchase closest in EITHER direction per user, tie -> earlier.
    Same one-shuffle union-window machinery as j_asof, with backward
    last() and forward first() sharing a single sort. Oracle is the
    min-|delta| specification via a plain join + rank."""
    from dataprocessingframework_spark.operators.joins import nearest_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("purchase_value"))
    )
    return (
        nearest_join(clicks, purchases, on="user_id", left_ts="ts")
        .select("event_id", "user_id", "matched_ts", "purchase_value")
        .orderBy("event_id")
    )


SQL_J_NEAREST = """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click'),
p AS (SELECT user_id, ts, ROUND(MAX(value), 2) AS purchase_value
      FROM events WHERE event_type='purchase' GROUP BY user_id, ts),
ranked AS (
  SELECT c.event_id, c.user_id, p.ts AS matched_ts, p.purchase_value,
         ROW_NUMBER() OVER (
           PARTITION BY c.event_id
           ORDER BY abs(epoch(c.ts) - epoch(p.ts)), p.ts
         ) AS rn
  FROM c JOIN p ON c.user_id = p.user_id
)
SELECT event_id, user_id, matched_ts, purchase_value
FROM ranked WHERE rn = 1 ORDER BY event_id
"""


def q_tx_remove_dup_passages(spark, sf_dir):
    """Corpus boilerplate REMOVAL (CCNet-style paragraph dedup on
    8-token tiles): passages occurring in >=2 distinct docs are cut
    and the survivors rejoined in original order. The mutation twin of
    tx_dup_passages (which only reports)."""
    return text_analysis.remove_dup_passages(
        T(spark, sf_dir, "documents"), n=8, min_docs=2
    ).orderBy("doc_id")


SQL_TX_REMOVE_DUP_PASSAGES = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), tiles AS (
  SELECT doc_id, s, array_to_string(t[s:s+7], ' ') AS p,
         CAST(concat('0x', substr(md5(array_to_string(t[s:s+7], ' ')), 1, 15))
              AS BIGINT) AS ph
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, GREATEST(len(t), 1), 8)) AS s
        FROM toks)
), freq AS (
  SELECT ph, COUNT(DISTINCT doc_id) AS docs FROM tiles GROUP BY ph
), flagged AS (
  SELECT doc_id, s, tiles.p, docs FROM tiles JOIN freq USING (ph)
), clean AS (
  SELECT doc_id, string_agg(p, ' ' ORDER BY s) AS clean_text,
         COUNT(*) AS n_kept
  FROM flagged WHERE docs < 2 GROUP BY doc_id
), totals AS (
  SELECT doc_id, COUNT(*) AS n_tiles FROM flagged GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(c.clean_text, '') AS clean_text,
       CAST(t.n_tiles - COALESCE(c.n_kept, 0) AS BIGINT) AS n_removed
FROM totals t LEFT JOIN clean c USING (doc_id) ORDER BY t.doc_id
"""


def q_a_winsorize(spark, sf_dir):
    """Winsorization report: exact p01/p99 of l_extendedprice, mean
    before/after clipping, clip count. The outlier-robust feature-prep
    step. Exact percentile keeps the oracle bit-stable; at 100 TB the
    same shape runs on percentile_approx (a_approx_sketches pins that
    path's error bound)."""
    li = T(spark, sf_dir, "lineitem")
    pct = li.agg(
        F.expr("percentile(l_extendedprice, array(0.01, 0.99))").alias("p")
    )
    clipped = li.crossJoin(F.broadcast(pct)).select(
        F.col("l_extendedprice").alias("x"),
        F.col("p")[0].alias("p01"),
        F.col("p")[1].alias("p99"),
    )
    return clipped.agg(
        F.round(F.first("p01"), 2).alias("p01"),
        F.round(F.first("p99"), 2).alias("p99"),
        F.round(F.avg("x"), 2).alias("avg_raw"),
        F.round(
            F.avg(F.greatest(F.least(F.col("x"), F.col("p99")), F.col("p01"))),
            2,
        ).alias("avg_winsorized"),
        F.sum(
            F.when(
                (F.col("x") < F.col("p01")) | (F.col("x") > F.col("p99")),
                1,
            ).otherwise(0)
        ).alias("n_clipped"),
    )


SQL_A_WINSORIZE = """
WITH p AS (
  SELECT quantile_cont(l_extendedprice, 0.01) AS p01,
         quantile_cont(l_extendedprice, 0.99) AS p99
  FROM lineitem
)
SELECT ROUND(ANY_VALUE(p01), 2) AS p01, ROUND(ANY_VALUE(p99), 2) AS p99,
       ROUND(AVG(l_extendedprice), 2) AS avg_raw,
       ROUND(AVG(GREATEST(LEAST(l_extendedprice, p99), p01)), 2)
         AS avg_winsorized,
       CAST(SUM(CASE WHEN l_extendedprice < p01 OR l_extendedprice > p99
                THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM lineitem, p
"""


def q_a_group_zscore(spark, sf_dir):
    """Per-group standardization + outlier pick: z-score of n_chars
    within each source (population stddev), keep |z| > 2. One window
    over source — group-local moments, no global pass."""
    w = Window.partitionBy("source")
    docs = T(spark, sf_dir, "documents")
    z = (F.col("n_chars") - F.avg("n_chars").over(w)) / F.stddev_pop(
        "n_chars"
    ).over(w)
    return (
        docs.select(
            "doc_id", "source", "n_chars", z.alias("_z")
        )
        .filter((F.col("_z") > 2) | (F.col("_z") < -2))
        .select(
            "doc_id", "source", "n_chars", F.round("_z", 3).alias("z")
        )
        .orderBy("doc_id")
    )


SQL_A_GROUP_ZSCORE = """
SELECT doc_id, source, n_chars, ROUND(z, 3) AS z FROM (
  SELECT doc_id, source, n_chars,
         (n_chars - AVG(n_chars) OVER (PARTITION BY source))
           / stddev_pop(n_chars) OVER (PARTITION BY source) AS z
  FROM documents
) WHERE z > 2 OR z < -2 ORDER BY doc_id
"""


def q_w_schema_evolution(spark, sf_dir):
    """Schema-evolution read: release v1 lacks the `quality` column,
    release v2 adds it; one mergeSchema read unions both with NULLs
    for the missing column — the additive-column upgrade path every
    long-lived corpus needs (parquet-native; no table format
    required). Aggregated per lang with per-release null accounting."""
    import shutil
    import uuid

    docs = T(spark, sf_dir, "documents")
    base = f"/root/repo/.scratch/schema_ev_{uuid.uuid4().hex[:8]}"
    try:
        docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "lang", "n_chars"
        ).write.parquet(f"{base}/v1")
        docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id",
            "lang",
            "n_chars",
            (F.col("n_chars") / 100.0).alias("quality"),
        ).write.parquet(f"{base}/v2")
        back = spark.read.option("mergeSchema", "true").parquet(
            f"{base}/v1", f"{base}/v2"
        )
        res = (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count("quality").alias("n_with_quality"),
                F.round(F.avg("quality"), 4).alias("avg_quality"),
            )
            .orderBy("lang")
        )
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_W_SCHEMA_EVOLUTION = """
WITH merged AS (
  SELECT lang, CAST(NULL AS DOUBLE) AS quality FROM documents
  WHERE doc_id % 2 = 0
  UNION ALL
  SELECT lang, n_chars / 100.0 AS quality FROM documents
  WHERE doc_id % 2 = 1
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(COUNT(quality) AS BIGINT) AS n_with_quality,
       ROUND(AVG(quality), 4) AS avg_quality
FROM merged GROUP BY lang ORDER BY lang
"""


def q_w_compact_small_files(spark, sf_dir):
    """Small-file compaction round-trip: fragment documents into 47
    tiny files, compact back to target-sized files (sources/compact.py
    compact_parquet: Hadoop-FS size stats, coalesce-preferred), verify
    CONTENT preservation per source. The file-count collapse itself is
    pinned by test_compact_parquet_reduces_file_count — file counts
    are not SQL-observable."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.compact import (
        compact_parquet,
    )

    base = f"/root/repo/.scratch/compact_{uuid.uuid4().hex[:8]}"
    try:
        T(spark, sf_dir, "documents").repartition(47).write.parquet(
            f"{base}/small"
        )
        compact_parquet(
            spark, f"{base}/small", f"{base}/compacted", target_file_mb=64
        )
        back = spark.read.parquet(f"{base}/compacted")
        res = (
            back.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
                F.count_distinct("doc_id").alias("n_ids"),
            )
            .orderBy("source")
        )
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_W_COMPACT_SMALL_FILES = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_ids
FROM documents GROUP BY source ORDER BY source
"""


def q_a_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift check between src0's and
    the rest's length distribution — the exact rank-based tripwire
    for "did this source shift?". Full-data work is ONE map-side-
    combinable groupBy(value); the ECDF window runs over the
    value-cardinality table only."""
    from dataprocessingframework_spark.operators.drift import ks_statistic

    docs = T(spark, sf_dir, "documents")
    return ks_statistic(
        docs.filter(F.col("source") == "src0"),
        docs.filter(F.col("source") != "src0"),
        "n_chars",
    )


SQL_A_KS_DRIFT = """
WITH u AS (
  SELECT CAST(n_chars AS DOUBLE) AS v,
         CASE WHEN source = 'src0' THEN 0 ELSE 1 END AS s
  FROM documents
), per_v AS (
  SELECT v, SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS da,
         SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS db
  FROM u GROUP BY v
), e AS (
  SELECT v, SUM(da) OVER (ORDER BY v) AS ca,
         SUM(db) OVER (ORDER BY v) AS cb
  FROM per_v
), t AS (
  SELECT CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM u
)
SELECT n_a, n_b,
       ROUND(MAX(ABS(CAST(ca AS DOUBLE) / n_a
                     - CAST(cb AS DOUBLE) / n_b)), 6) AS ks_d
FROM e, t GROUP BY n_a, n_b
"""


def q_a_psi_drift(spark, sf_dir):
    """Population Stability Index between the even- and odd-doc_id
    halves of the corpus on n_chars (10 bins on [0,400], Laplace 0.5)
    — the binned drift score for release-over-release monitoring. Two
    aggregate passes over portable floor bins; bin table is
    bins-sized."""
    from dataprocessingframework_spark.operators.drift import psi

    docs = T(spark, sf_dir, "documents")
    return psi(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "n_chars",
        lo=0.0,
        hi=400.0,
        bins=10,
    )


SQL_A_PSI_DRIFT = """
WITH binned AS (
  SELECT LEAST(GREATEST(FLOOR((CAST(n_chars AS DOUBLE) - 0.0) / 40.0),
               0), 9) AS bin,
         doc_id % 2 AS side
  FROM documents
), counts AS (
  SELECT t.bin,
         COALESCE(SUM(CASE WHEN side = 0 THEN 1 END), 0) + 0.5 AS ca,
         COALESCE(SUM(CASE WHEN side = 1 THEN 1 END), 0) + 0.5 AS cb
  FROM (SELECT unnest(range(0, 10)) AS bin) t
  LEFT JOIN binned ON binned.bin = t.bin
  GROUP BY t.bin
), tot AS (
  SELECT SUM(ca) AS ta, SUM(cb) AS tb FROM counts
)
SELECT ROUND(SUM((ca / ta - cb / tb) * (ln(ca / ta) - ln(cb / tb))), 6)
         AS psi,
       CAST(ANY_VALUE(ta) - 5.0 AS BIGINT) AS n_a,
       CAST(ANY_VALUE(tb) - 5.0 AS BIGINT) AS n_b
FROM counts, tot
"""


def q_tx_bigram_nll(spark, sf_dir):
    """Per-doc mean NLL under the corpus' add-0.1-smoothed bigram
    model — the word-ORDER-sensitive fluency signal one rung above
    tx_unigram_nll on the KenLM ladder."""
    return text_analysis.bigram_nll(
        T(spark, sf_dir, "documents")
    ).orderBy("doc_id")


SQL_TX_BIGRAM_NLL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), uni AS (
  SELECT term, COUNT(*) AS uc
  FROM (SELECT unnest(t) AS term FROM toks) GROUP BY term
), v AS (SELECT COUNT(*) AS v FROM uni),
bi AS (
  SELECT doc_id, t[i] AS prev, t[i] || ' ' || t[i+1] AS bg
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2)
), bc AS (SELECT bg, COUNT(*) AS bc FROM bi GROUP BY bg)
SELECT doc_id,
       ROUND(AVG(-ln((bc.bc + 0.1) / (uni.uc + 0.1 * v.v))), 4)
         AS mean_nll,
       COUNT(*) AS n_bigrams
FROM bi JOIN bc USING (bg) JOIN uni ON bi.prev = uni.term CROSS JOIN v
GROUP BY doc_id ORDER BY doc_id
"""


def q_emb_quantize(spark, sf_dir):
    """SQ8 embedding quantization (FAISS-style scalar min/max codes):
    the 4x storage cut for a 100 TB embedding store. Codes are pure
    floor arithmetic — bit-portable — so the oracle recomputes the
    whole codebook in SQL. Output collapses the code vector to a
    position-weighted checksum + end codes (array columns stringify
    differently across engines)."""
    q = similarity.quantize_embeddings(T(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        F.aggregate(
            F.zip_with(
                F.col("codes"),
                F.sequence(F.lit(1), F.size("codes")),
                lambda c, i: c.cast("long") * i.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("code_checksum"),
        F.col("codes")[0].alias("c_first"),
        F.element_at(F.col("codes"), -1).alias("c_last"),
        F.round("mse", 8).alias("mse"),
    ).orderBy("vec_id")


SQL_EMB_QUANTIZE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pe AS (SELECT i AS pos, MIN(v[i]) AS mn, MAX(v[i]) AS mx
       FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
       GROUP BY i),
b AS (SELECT list(mn ORDER BY pos) AS mins,
             list(mx ORDER BY pos) AS maxs FROM pe),
coded AS (
  SELECT vec_id,
    list_transform(range(1, 65), i ->
      CASE WHEN maxs[i] > mins[i]
        THEN LEAST(255, CAST(FLOOR((v[i] - mins[i])
                   / (maxs[i] - mins[i]) * 256.0) AS BIGINT))
        ELSE 0 END) AS codes,
    list_transform(range(1, 65), i ->
      CASE WHEN maxs[i] > mins[i]
        THEN pow(v[i] - (mins[i]
             + (LEAST(255, CAST(FLOOR((v[i] - mins[i])
                     / (maxs[i] - mins[i]) * 256.0) AS BIGINT)) + 0.5)
               * (maxs[i] - mins[i]) / 256.0), 2)
        ELSE pow(v[i] - (mins[i] + 0.5 * (maxs[i] - mins[i]) / 256.0), 2)
      END) AS errs
  FROM e CROSS JOIN b
)
SELECT vec_id,
  CAST(list_sum(list_transform(range(1, 65),
       i -> codes[i] * i)) AS BIGINT) AS code_checksum,
  CAST(codes[1] AS INT) AS c_first,
  CAST(codes[64] AS INT) AS c_last,
  ROUND(list_sum(errs) / 64.0, 8) AS mse
FROM coded ORDER BY vec_id
"""


def q_stream_psi_monitor(spark, sf_dir):
    """§2.12 + drift tier: per-hour PSI of the event value
    distribution against the full-corpus baseline — the streaming
    drift tripwire. ONE watermarked windowed aggregation (bins as
    conditional sums — no chained stateful ops), baseline broadcast
    as one smoothed-fraction row. Batch twin under the oracle; the
    real readStream run is pinned in
    test_windowed_psi_streaming_matches_batch."""
    from dataprocessingframework_spark.streaming import windowed_psi

    ev = T(spark, sf_dir, "events")
    return windowed_psi(
        ev, ev, window="1 hour", lo=0.0, hi=500.0, bins=10
    ).orderBy("win_start")


SQL_STREAM_PSI_MONITOR = """
WITH b AS (
  SELECT LEAST(GREATEST(FLOOR(value / 50.0), 0), 9) AS bin FROM events
), bc AS (
  SELECT t.bin, COALESCE(COUNT(b.bin), 0) + 0.5 AS c
  FROM (SELECT unnest(range(0, 10)) AS bin) t
  LEFT JOIN b ON b.bin = t.bin GROUP BY t.bin
), bt AS (SELECT SUM(c) AS tc FROM bc),
wb AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
         LEAST(GREATEST(FLOOR(value / 50.0), 0), 9) AS bin
  FROM events
), wins AS (
  SELECT win_start, COUNT(*) AS n_events FROM wb GROUP BY win_start
), wcnt AS (
  SELECT win_start, bin, COUNT(*) AS c FROM wb GROUP BY win_start, bin
), grid AS (
  SELECT w.win_start, t.bin
  FROM wins w CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) t
), wsm AS (
  SELECT g.win_start, g.bin, COALESCE(wcnt.c, 0) + 0.5 AS c
  FROM grid g LEFT JOIN wcnt
    ON wcnt.win_start = g.win_start AND wcnt.bin = g.bin
), wtot AS (
  SELECT win_start, SUM(c) AS tc FROM wsm GROUP BY win_start
)
SELECT wsm.win_start, ANY_VALUE(wins.n_events) AS n_events,
       ROUND(SUM((wsm.c / wtot.tc - bc.c / bt.tc)
                 * (ln(wsm.c / wtot.tc) - ln(bc.c / bt.tc))), 6) AS psi
FROM wsm
JOIN wtot ON wtot.win_start = wsm.win_start
JOIN bc ON bc.bin = wsm.bin
CROSS JOIN bt
JOIN wins ON wins.win_start = wsm.win_start
GROUP BY wsm.win_start ORDER BY wsm.win_start
"""


def q_a_benford(spark, sf_dir):
    """Benford first-significant-digit audit of l_extendedprice: the
    classic synthetic-data / fraud tripwire. Per digit: observed share
    vs the Benford expectation log10(1 + 1/d) and the chi-square
    contribution. One narrow projection + one 9-group aggregate."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    digit = F.substring(
        F.regexp_replace(
            F.format_number(F.col("l_extendedprice").cast("double"), 10),
            "[^1-9]",
            "",
        ),
        1,
        1,
    ).cast("int")
    tot = li.agg(F.count(F.lit(1)).alias("n"))
    per = (
        li.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(tot))
    )
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    observed = F.col("cnt") / F.col("n")
    return per.select(
        "digit",
        "cnt",
        F.round(observed, 6).alias("observed"),
        F.round(expected, 6).alias("expected"),
        F.round(
            F.pow(observed - expected, F.lit(2.0)) / expected * F.col("n"), 4
        ).alias("chi2_term"),
    ).orderBy("digit")


SQL_A_BENFORD = """
WITH base AS (
  SELECT CAST(substr(regexp_replace(
           format('{:.10f}', CAST(l_extendedprice AS DOUBLE)),
           '[^1-9]', '', 'g'), 1, 1) AS INT) AS digit
  FROM lineitem WHERE l_extendedprice > 0
), tot AS (SELECT COUNT(*) AS n FROM base)
SELECT digit, COUNT(*) AS cnt,
       ROUND(COUNT(*) / CAST(n AS DOUBLE), 6) AS observed,
       ROUND(log10(1.0 + 1.0 / digit), 6) AS expected,
       ROUND(pow(COUNT(*) / CAST(n AS DOUBLE)
                 - log10(1.0 + 1.0 / digit), 2)
             / log10(1.0 + 1.0 / digit) * n, 4) AS chi2_term
FROM base CROSS JOIN tot
GROUP BY digit, n ORDER BY digit
"""


def q_a_gini(spark, sf_dir):
    """Gini inequality of document lengths — the budget-concentration
    audit. Grouped closed form over the per-distinct-value table (one
    map-side-combinable groupBy; window sees distinct values only)."""
    from dataprocessingframework_spark.operators.drift import gini

    return gini(T(spark, sf_dir, "documents"), "n_chars")


SQL_A_GINI = """
WITH per_v AS (
  SELECT CAST(n_chars AS DOUBLE) AS v, COUNT(*) AS c
  FROM documents GROUP BY v
), cum AS (
  SELECT v, c, SUM(c) OVER (ORDER BY v) AS rc FROM per_v
)
SELECT CAST(SUM(c) AS BIGINT) AS n,
       ROUND(SUM(v * c * (2 * rc - c + 1)) / (SUM(c) * SUM(v * c))
             - (SUM(c) + 1.0) / SUM(c), 6) AS gini
FROM cum
"""


def q_w_scd2(spark, sf_dir):
    """SCD Type-2 history apply: a change batch (relabels to 'zz',
    no-op re-assertions, brand-new keys, plus an older superseded
    change that latest-wins must drop) applied to an open history
    built from documents. Closed rows get valid_to = eff ts; new open
    versions append; no-ops leave history untouched. One change-batch
    window + one key join — see operators/versioning.scd2_apply."""
    from dataprocessingframework_spark.operators.versioning import scd2_apply

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 3000)
    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    current = docs.select(
        "doc_id",
        "lang",
        t0.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    eff = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    old_eff = F.to_timestamp(F.lit("2024-03-01 00:00:00"))
    relabel = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.lit("zz").alias("lang"), eff.alias("eff_ts")
    )
    noop = docs.filter(
        (F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 5 != 0)
    ).select("doc_id", "lang", eff.alias("eff_ts"))
    fresh = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.lit("xx").alias("lang"),
        eff.alias("eff_ts"),
    )
    superseded = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.lit("de").alias("lang"), old_eff.alias("eff_ts")
    )
    changes = relabel.unionByName(noop).unionByName(fresh).unionByName(
        superseded
    )
    return scd2_apply(
        current, changes, key_cols=["doc_id"], attr_cols=["lang"]
    ).orderBy("doc_id", "valid_from")


SQL_W_SCD2 = """
WITH docs AS (SELECT doc_id, lang FROM documents WHERE doc_id < 3000)
SELECT doc_id, lang,
       TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
       CASE WHEN doc_id % 5 = 0 AND lang <> 'zz'
            THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to,
       NOT (doc_id % 5 = 0 AND lang <> 'zz') AS is_current
FROM docs
UNION ALL
SELECT doc_id, 'zz' AS lang,
       TIMESTAMP '2024-06-01 00:00:00' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
FROM docs WHERE doc_id % 5 = 0 AND lang <> 'zz'
UNION ALL
SELECT doc_id + 100000 AS doc_id, 'xx' AS lang,
       TIMESTAMP '2024-06-01 00:00:00' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
FROM docs WHERE doc_id < 50
ORDER BY doc_id, valid_from
"""


def q_ev_ab_metrics(spark, sf_dir):
    """A/B experiment readout on deterministic assignment: users split
    into control/treatment by the portable hash (the same primitive as
    d_split_assign, so assignment is reproducible on any engine), then
    per-arm user counts, conversion to 'purchase', mean per-user
    purchase value, and the Welch t statistic — all from ONE user-level
    aggregate + one single-row conditional aggregate."""
    from dataprocessingframework_spark.functions.hashing import hash64

    ev = T(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("purchase_value"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    armed = per_user.withColumn(
        "arm",
        hash64(F.concat(F.lit("ab|"), F.col("user_id").cast("string"))) % 2,
    )
    agg = armed.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_control"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_treat"),
        F.sum(
            F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)
        ).alias("conv_control"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)
        ).alias("conv_treat"),
        F.avg(F.when(F.col("arm") == 0, F.col("purchase_value"))).alias("m0"),
        F.avg(F.when(F.col("arm") == 1, F.col("purchase_value"))).alias("m1"),
        F.var_samp(
            F.when(F.col("arm") == 0, F.col("purchase_value"))
        ).alias("v0"),
        F.var_samp(
            F.when(F.col("arm") == 1, F.col("purchase_value"))
        ).alias("v1"),
    )
    return agg.select(
        "n_control",
        "n_treat",
        "conv_control",
        "conv_treat",
        F.round("m0", 4).alias("mean_control"),
        F.round("m1", 4).alias("mean_treat"),
        F.round(
            (F.col("m1") - F.col("m0"))
            / F.sqrt(
                F.col("v1") / F.col("n_treat")
                + F.col("v0") / F.col("n_control")
            ),
            4,
        ).alias("t_welch"),
    )


SQL_EV_AB_METRICS = """
WITH per_user AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
           AS purchase_value,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
), armed AS (
  SELECT *,
         CAST(concat('0x', substr(md5('ab|' || CAST(user_id AS VARCHAR)),
              1, 15)) AS BIGINT) % 2 AS arm
  FROM per_user
), agg AS (
  SELECT
    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_control,
    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_treat,
    SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS conv_control,
    SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS conv_treat,
    AVG(CASE WHEN arm = 0 THEN purchase_value END) AS m0,
    AVG(CASE WHEN arm = 1 THEN purchase_value END) AS m1,
    var_samp(CASE WHEN arm = 0 THEN purchase_value END) AS v0,
    var_samp(CASE WHEN arm = 1 THEN purchase_value END) AS v1
  FROM armed
)
SELECT CAST(n_control AS BIGINT) AS n_control,
       CAST(n_treat AS BIGINT) AS n_treat,
       CAST(conv_control AS BIGINT) AS conv_control,
       CAST(conv_treat AS BIGINT) AS conv_treat,
       ROUND(m0, 4) AS mean_control, ROUND(m1, 4) AS mean_treat,
       ROUND((m1 - m0) / sqrt(v1 / n_treat + v0 / n_control), 4) AS t_welch
FROM agg
"""


def q_tx_remove_dup_spans(spark, sf_dir):
    """Exact duplicated-span removal (Lee et al. ExactSubstr at token
    granularity): 5-token windows at EVERY offset, windows duplicated
    across >=2 docs merge into maximal spans whose tokens are cut.
    The alignment-robust big sibling of tx_remove_dup_passages."""
    return text_analysis.remove_dup_spans(
        T(spark, sf_dir, "documents"), n=5, min_docs=2
    ).orderBy("doc_id")


SQL_TX_REMOVE_DUP_SPANS = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), occ AS (
  SELECT doc_id, i - 1 AS s, i + 3 AS e,
         CAST(concat('0x', substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))
              AS BIGINT) AS g
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
        FROM toks WHERE len(t) >= 5)
), dupg AS (
  SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS d FROM occ GROUP BY g)
  WHERE d >= 2
), hits AS (
  SELECT doc_id, s, e FROM occ SEMI JOIN dupg USING (g)
), flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR s > MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS new
  FROM hits
), spans AS (
  SELECT doc_id, span, MIN(s) AS s, MAX(e) AS e
  FROM (SELECT doc_id, s, e,
               SUM(new) OVER (PARTITION BY doc_id ORDER BY s) AS span
        FROM flagged)
  GROUP BY doc_id, span
), tokidx AS (
  SELECT doc_id, j - 1 AS idx, t[j] AS tok
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, GREATEST(len(t), 1))) AS j
        FROM toks)
  WHERE j <= len(t)
), kept AS (
  SELECT ti.doc_id, ti.idx, ti.tok FROM tokidx ti
  WHERE NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = ti.doc_id AND sp.s <= ti.idx AND ti.idx <= sp.e)
), agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text
  FROM kept GROUP BY doc_id
), rem AS (
  SELECT doc_id, CAST(SUM(e - s + 1) AS BIGINT) AS n_removed,
         CAST(COUNT(*) AS BIGINT) AS n_spans
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
       CAST(COALESCE(r.n_spans, 0) AS BIGINT) AS n_spans
FROM documents d
LEFT JOIN agg a ON a.doc_id = d.doc_id
LEFT JOIN rem r ON r.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def q_dd_containment(spark, sf_dir):
    """Asymmetric near-containment pairs (|A∩B|/min sets >= 0.9):
    the quote/subset detector symmetric Jaccard misses. Quadratic
    verification shape here (oracle parity); compose with LSH
    candidates at scale like dd_jaccard_lsh."""
    return dedup.containment_pairs(
        T(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000),
        "text",
        "doc_id",
        threshold=0.9,
    ).orderBy("id_a", "id_b")


SQL_DD_CONTAINMENT = """
WITH words AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w
    FROM documents WHERE doc_id < 2000
  ) WHERE w <> ''
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(CAST(i AS DOUBLE) / LEAST(sa.n, sb.n), 4) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.9
ORDER BY id_a, id_b
"""


def q_f_lag_features(spark, sf_dir):
    """Per-customer order lag features (order index, previous total,
    delta, days since previous order) — the classic supervised-ML
    feature build. One customer-keyed window family: every feature
    shares a single shuffle + sort."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.row_number().over(w).alias("order_idx"),
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_total"),
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
            ).alias("delta_total"),
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("days_since_prev"),
        )
        .orderBy("o_custkey", "order_idx")
    )


SQL_F_LAG_FEATURES = """
SELECT o_custkey, o_orderkey, o_orderdate,
       ROW_NUMBER() OVER w AS order_idx,
       ROUND(LAG(o_totalprice) OVER w, 2) AS prev_total,
       ROUND(o_totalprice - LAG(o_totalprice) OVER w, 2) AS delta_total,
       CAST(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate) AS INT)
         AS days_since_prev
FROM orders WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, order_idx
"""


def q_emb_code_dedup(spark, sf_dir):
    """Quantization-bucketed embedding near-dup: coarse SQ codes over
    the first 4 dims (levels=4 -> 256 buckets) bucket the corpus; only
    same-bucket pairs are cosine-verified at >= 0.3 — a deterministic
    ANN-dedup path that needs no training and no broadcast of vectors
    (approximate-by-bucketing, exact-on-verified-pairs). Fully
    oracled: codes are floor arithmetic, cosine is the proven fold."""
    emb = T(spark, sf_dir, "embeddings")
    coded = similarity.quantize_embeddings(emb, levels=4).select(
        "vec_id",
        F.concat_ws(
            ",", F.slice(F.col("codes"), 1, 4).cast("array<string>")
        ).alias("code_key"),
    )
    a = coded.alias("a")
    b = coded.alias("b")
    pairs = a.join(
        b,
        on=[
            F.col("a.code_key") == F.col("b.code_key"),
            F.col("a.vec_id") < F.col("b.vec_id"),
        ],
    ).select(
        F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
    )
    e1 = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    e2 = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    cos = similarity.cosine(F.col("va"), F.col("vb"))
    return (
        pairs.join(e1, "id_a")
        .join(e2, "id_b")
        .select("id_a", "id_b", F.round(cos, 4).alias("cos"))
        .filter(F.col("cos") >= 0.3)
        .orderBy("id_a", "id_b")
    )


SQL_EMB_CODE_DEDUP = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pe AS (SELECT i AS pos, MIN(v[i]) AS mn, MAX(v[i]) AS mx
       FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t GROUP BY i),
b AS (SELECT list(mn ORDER BY pos) AS mins,
             list(mx ORDER BY pos) AS maxs FROM pe),
coded AS (
  SELECT vec_id, v,
    array_to_string(list_transform(range(1, 5), i ->
      CASE WHEN maxs[i] > mins[i]
        THEN LEAST(3, CAST(FLOOR((v[i] - mins[i])
                   / (maxs[i] - mins[i]) * 4.0) AS BIGINT))
        ELSE 0 END), ',') AS code_key
  FROM e CROSS JOIN b
), pairs AS (
  SELECT a.vec_id AS id_a, b2.vec_id AS id_b, a.v AS va, b2.v AS vb
  FROM coded a JOIN coded b2
    ON a.code_key = b2.code_key AND a.vec_id < b2.vec_id
)
SELECT id_a, id_b,
       ROUND(list_dot_product(va, vb) /
             (sqrt(list_dot_product(va, va))
              * sqrt(list_dot_product(vb, vb))), 4) AS cos
FROM pairs
WHERE ROUND(list_dot_product(va, vb) /
      (sqrt(list_dot_product(va, va))
       * sqrt(list_dot_product(vb, vb))), 4) >= 0.3
ORDER BY id_a, id_b
"""


def q_a_sketch_intersection(spark, sf_dir):
    """Sketch-level overlap estimate by inclusion-exclusion:
    |A∩B| ≈ |A| + |B| - |A∪B| from per-half HLL sketches of user_id
    (events split by event_id parity) — the cross-dataset overlap
    audit without a join. Oracle pattern as a_sketch_union: exact
    twins value-match; the estimate collapses to a within-bound
    boolean (inclusion-exclusion compounds the ~1.6% rse of three
    sketches, so the bound is 10% of the union)."""
    ev = T(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    sk = (
        a.select(F.col("user_id").alias("u")).agg(
            F.hll_sketch_agg("u").alias("ska")
        )
    ).crossJoin(
        b.select(F.col("user_id").alias("u")).agg(
            F.hll_sketch_agg("u").alias("skb")
        )
    )
    est = sk.select(
        F.hll_sketch_estimate("ska").alias("ea"),
        F.hll_sketch_estimate("skb").alias("eb"),
        F.hll_sketch_estimate(
            F.hll_union("ska", "skb")
        ).alias("eu"),
    )
    exact = (
        a.select("user_id")
        .intersect(b.select("user_id"))
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
        .crossJoin(
            ev.agg(F.count_distinct("user_id").alias("exact_union"))
        )
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "exact_overlap",
        "exact_union",
        (
            F.abs(
                (F.col("ea") + F.col("eb") - F.col("eu"))
                - F.col("exact_overlap")
            )
            / F.col("exact_union")
            <= 0.10
        ).alias("ok_overlap"),
    )


SQL_A_SKETCH_INTERSECTION = """
SELECT
  (SELECT COUNT(*) FROM (
     SELECT user_id FROM events WHERE event_id % 2 = 0
     INTERSECT
     SELECT user_id FROM events WHERE event_id % 2 = 1))
    AS exact_overlap,
  (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_union,
  TRUE AS ok_overlap
"""


def q_w_time_travel(spark, sf_dir):
    """Versioned-table commit log + time travel (sources/versioned.py,
    the Delta/Iceberg mechanic in miniature): three commits (base
    slice, append, overwrite), then every HISTORICAL version is read
    back through its manifest and aggregated — proving old snapshots
    stay exactly readable after later commits. Oracle derives the same
    three version states from the base table."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.versioned import (
        commit,
        read_version,
    )

    docs = T(spark, sf_dir, "documents")
    base = f"/root/repo/.scratch/vtable_{uuid.uuid4().hex[:8]}"
    try:
        commit(spark, docs.filter(F.col("doc_id") % 3 == 0), base)
        commit(
            spark,
            docs.filter(F.col("doc_id") % 3 == 1),
            base,
            mode="append",
        )
        commit(
            spark,
            docs.filter(F.col("doc_id") < 100),
            base,
            mode="overwrite",
        )
        stats = []
        for v in (0, 1, 2):
            r = (
                read_version(spark, base, v)
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum("n_chars").alias("sum_chars"),
                )
                .collect()[0]
            )
            stats.append((v, r["rows"], r["sum_chars"]))
        return spark.createDataFrame(
            stats, "version int, rows bigint, sum_chars bigint"
        ).orderBy("version")
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_W_TIME_TRAVEL = """
SELECT 0 AS version, COUNT(*) AS rows,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT 1, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
FROM documents WHERE doc_id % 3 IN (0, 1)
UNION ALL
SELECT 2, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
FROM documents WHERE doc_id < 100
ORDER BY version
"""


def q_w_incremental_read(spark, sf_dir):
    """Per-release delta consumption on the versioned table: commit a
    base slice then an append; read_changes(0, 1) must surface EXACTLY
    the appended rows by reading only the files new in v1's manifest —
    the incremental-downstream primitive (no rescan of the base)."""
    import shutil
    import uuid

    from dataprocessingframework_spark.sources.versioned import (
        commit,
        read_changes,
    )

    docs = T(spark, sf_dir, "documents")
    base = f"/root/repo/.scratch/vdelta_{uuid.uuid4().hex[:8]}"
    try:
        commit(spark, docs.filter(F.col("doc_id") % 3 == 0), base)
        commit(
            spark,
            docs.filter(F.col("doc_id") % 3 == 1),
            base,
            mode="append",
        )
        delta = (
            read_changes(spark, base, 0, 1)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
            )
            .orderBy("source")
        )
        return spark.createDataFrame(delta.collect(), delta.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_W_INCREMENTAL_READ = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 3 = 1
GROUP BY source ORDER BY source
"""


def q_emb_ivf_topk_seeded(spark, sf_dir):
    """IVF ANN with iters=0: coarse centroids are the 16 hash-min
    corpus vectors VERBATIM (no Lloyd averaging), so cell assignment,
    probing, and scoring are pure portable arithmetic and the whole
    IVF pipeline gets a FULL cross-engine oracle — the oracled member
    of the IVF family (emb_ivf_topk keeps Lloyd refinement and stays
    rows-only: float-mean order is partitioning-dependent)."""
    emb = T(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=5,
        n_cells=16,
        n_probe=4,
        iters=0,
        impl="jvm",
    ).orderBy("q_id", "nbr_id")


SQL_EMB_IVF_TOPK_SEEDED = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
h AS (
  SELECT vec_id, v,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
), cents AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT v AS cv, hh FROM h ORDER BY hh LIMIT 16)
), corpus_cells AS (
  SELECT nbr_id, cvv, cell FROM (
    SELECT e.vec_id AS nbr_id, e.v AS cvv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1
), probes AS (
  SELECT q_id, qv, cell FROM (
    SELECT e.vec_id AS q_id, e.v AS qv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
    FROM e CROSS JOIN cents c WHERE e.vec_id < 5) WHERE rn <= 4
), scored AS (
  SELECT q_id, nbr_id,
         list_dot_product(qv, cvv) /
           (sqrt(list_dot_product(qv, qv))
            * sqrt(list_dot_product(cvv, cvv))) AS cos_raw
  FROM corpus_cells JOIN probes USING (cell)
  WHERE nbr_id <> q_id
)
SELECT q_id, nbr_id, ROUND(cos_raw, 4) AS cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, nbr_id) AS rn
  FROM scored) WHERE rn <= 5
ORDER BY q_id, nbr_id
"""


def q_emb_ivf_cell_stats(spark, sf_dir):
    """IVF quantizer cell-balance diagnostics (r11) — the report
    that sizes n_cells/n_probe/max_cell_rows before building a 100 TB
    index: probe latency is governed by the largest probed cell and
    the semantic-gate salting threshold should be read off max_cell,
    not guessed. Seeded iters=0 quantizer (the md5 hash-min
    construction shared with emb_ivf_topk_seeded) makes every cell
    assignment portable arithmetic, so the whole one-row report is
    FULL-oracled. One groupBy(cell) count + one aggregate over the
    ≤16-row size table — never corpus-sized."""
    emb = T(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    cents = similarity._ivf_centroids(
        corpus, "vec_id", "embedding", 16, iters=0
    )
    assigned = similarity.assign_cells(
        corpus.select(
            "vec_id",
            "embedding",
            similarity.norm(F.col("embedding")).alias("vnorm"),
        ).filter(F.col("vnorm") > 0),
        cents,
        "vec_id",
        "embedding",
        n_probe=1,
        impl="jvm",
    )
    return similarity.ivf_cell_stats(assigned, n_cells=16)


SQL_EMB_IVF_CELL_STATS = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
h AS (
  SELECT vec_id, v,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
), cents AS (
  -- seeds from the UNFILTERED corpus, mirroring _ivf_centroids
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT v AS cv, hh FROM h ORDER BY hh LIMIT 16)
), nz AS (
  SELECT vec_id, v FROM e
  WHERE sqrt(list_dot_product(v, v)) > 0
), corpus_cells AS (
  SELECT vec_id, cell FROM (
    SELECT nz.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY nz.vec_id
             ORDER BY list_dot_product(nz.v, c.cv) DESC, c.cell) AS rn
    FROM nz CROSS JOIN cents c) WHERE rn = 1
), sizes AS (
  SELECT cell, COUNT(*) AS sz FROM corpus_cells GROUP BY cell
)
SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
       COUNT(*) AS n_used,
       16 - COUNT(*) AS n_empty,
       MIN(sz) AS min_cell,
       MAX(sz) AS max_cell,
       ROUND(AVG(sz), 4) AS avg_cell,
       ROUND(CAST(MAX(sz) AS DOUBLE) / SUM(sz), 4) AS top_share,
       ROUND(CAST(MAX(sz) AS DOUBLE) / AVG(sz), 4) AS imbalance
FROM sizes
"""


def q_emb_ivf_balance(spark, sf_dir):
    """Hot-cell quantizer splitting end to end (r12): seed a
    DELIBERATELY coarse quantizer (n_cells=4, so at least one cell
    must exceed the ceil(N/8) cap), run ONE balance_centroids round
    (each hot cell's centroid replaced by its md5-hash-order seed
    row, second seed appended), and report the rebalanced cell-size
    table. The repair companion to emb_ivf_cell_stats: at 100 TB a
    mega-cell is probe latency AND gate-candidate blowup, and
    salting only caps task memory — splitting fixes the quantizer.
    Every step is portable arithmetic (hash-order seeds, argmax-dot
    assignment, lower-cell ties), so the post-split assignment is
    FULL-oracled."""
    emb = T(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    nz = corpus.select(
        F.col("vec_id").alias("bid"),
        F.col("embedding").alias("bv"),
        similarity.norm(F.col("embedding")).alias("bn"),
    ).filter(F.col("bn") > 0)
    cap = (nz.count() + 7) // 8
    cents = similarity._ivf_centroids(
        corpus, "vec_id", "embedding", 4, iters=0
    )
    balanced = similarity.balance_centroids(
        corpus, cents, cap, rounds=1, impl="jvm"
    )
    return (
        similarity.assign_cells(nz, balanced, "bid", "bv", n_probe=1)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.col("cell").cast("int").alias("cell"), "n_rows")
        .orderBy("cell")
    )


def q_emb_rebalance_policy(spark, sf_dir):
    """Auto-rebalance DECISION arithmetic (r13 — VERDICT r12 item 4):
    the deterministic trigger that
    ``incremental_semantic_ingest(rebalance_on_imbalance=...)``
    evaluates after every index append, FULL-oracled on the seeded
    coarse quantizer (n_cells=4, iters=0 — hash-order seeds +
    argmax-dot assignment, the same portable arithmetic the
    emb_ivf_balance oracle replays). ``triggered_hot`` is the
    production decision (imbalance > 1.5 AND max_cell > ceil(N/8));
    ``capacity_guard_triggered`` pins the guard's other leg — with
    the cap at the whole corpus size no cell can exceed it, so a
    skewed-but-uncappable index must NOT fire (splitting can't fix a
    capacity problem). Both booleans are DERIVED in the oracle from
    the same cell sizes, not pinned constants."""
    emb = T(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    nz = corpus.select(
        F.col("vec_id").alias("bid"),
        F.col("embedding").alias("bv"),
        similarity.norm(F.col("embedding")).alias("bn"),
    ).filter(F.col("bn") > 0)
    cap = (nz.count() + 7) // 8
    cents = similarity._ivf_centroids(
        corpus, "vec_id", "embedding", 4, iters=0
    )
    assigned = similarity.assign_cells(nz, cents, "bid", "bv", n_probe=1)
    hot = similarity.rebalance_trigger(assigned, 1.5, cap)
    guard = similarity.rebalance_trigger(assigned, 1.5, hot["n_rows"])
    return spark.createDataFrame(
        [
            (
                hot["n_rows"],
                hot["n_used"],
                hot["max_cell"],
                round(hot["imbalance"], 4),
                hot["triggered"],
                guard["triggered"],
            )
        ],
        schema=(
            "n_rows long, n_used long, max_cell long, imbalance double,"
            " triggered_hot boolean, capacity_guard_triggered boolean"
        ),
    )


SQL_EMB_REBALANCE_POLICY = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
h AS (
  SELECT vec_id, v,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
), cents AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT v AS cv, hh FROM h ORDER BY hh LIMIT 4)
), nz AS (
  SELECT vec_id, v FROM e
  WHERE sqrt(list_dot_product(v, v)) > 0
), cap AS (
  SELECT CAST((COUNT(*) + 7) // 8 AS BIGINT) AS cap FROM nz
), a0 AS (
  SELECT vec_id, cell FROM (
    SELECT nz.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY nz.vec_id
             ORDER BY list_dot_product(nz.v, c.cv) DESC, c.cell) AS rn
    FROM nz CROSS JOIN cents c) WHERE rn = 1
), sizes AS (
  SELECT cell, COUNT(*) AS sz FROM a0 GROUP BY cell
), agg AS (
  SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_used,
         CAST(MAX(sz) AS BIGINT) AS max_cell,
         CAST(MAX(sz) AS DOUBLE) / AVG(sz) AS imb
  FROM sizes
)
SELECT n_rows, n_used, max_cell, ROUND(imb, 4) AS imbalance,
       (imb > 1.5 AND max_cell > cap.cap) AS triggered_hot,
       (imb > 1.5 AND max_cell > n_rows) AS capacity_guard_triggered
FROM agg CROSS JOIN cap
"""


def q_emb_gate_rung_policy(spark, sf_dir):
    """Gate-rung auto-picker decision arithmetic (r14 — VERDICT r13
    item 5): ``gate_rung_signals`` (training-free corpus signals:
    rest-mass p95 at d_p=16 for the prefix rung, the SQ8 derived
    margin 2Δ/min‖v‖ on the corpus's own min/max grid) fed through
    ``recommend_gate_rung`` with explicit cutoffs — the verdict
    ``incremental_semantic_ingest(auto_rung=...)`` executes at
    bootstrap. Two corpus variants pin BOTH decision legs: ``raw``
    (the synthetic random embeddings — rest mass ≈ sqrt(1 − 16/64),
    prefix REJECTED) and ``matryoshka`` (dims scaled by 0.125^(i//16)
    — exact power-of-two scaling, bit-portable — mass concentrates
    early, prefix VIABLE). Every float is derived in the oracle from
    the same arithmetic; the booleans and the rung string are the
    policy itself, not pinned constants."""
    from dataprocessingframework_spark.operators.similarity import (
        gate_rung_signals,
        recommend_gate_rung,
    )

    emb = T(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    mat = corpus.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x, i: x * F.pow(F.lit(0.125), F.floor(i / F.lit(16))),
        ).alias("embedding"),
    )
    rows = []
    for variant, c in (("matryoshka", mat), ("raw", corpus)):
        sig = gate_rung_signals(c, prefix_dims=16)
        dec = recommend_gate_rung(
            threshold=0.95,
            rest_mass_p95=sig["rest_mass_p95"],
            sq8_margin=sig["sq8_margin"],
        )
        rows.append(
            (
                variant,
                sig["n_rows"],
                round(float(sig["rest_mass_p95"]), 4),
                round(float(sig["delta"]), 4),
                round(float(sig["min_vnorm"]), 4),
                round(float(sig["sq8_margin"]), 4),
                dec["viable_prefix"],
                dec["viable_sq8"],
                dec["rung"],
            )
        )
    return spark.createDataFrame(
        rows,
        schema=(
            "variant string, n_rows long, rest_mass_p95 double,"
            " delta double, min_vnorm double, sq8_margin double,"
            " viable_prefix boolean, viable_sq8 boolean, rung string"
        ),
    )


SQL_EMB_GATE_RUNG_POLICY = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
ex AS (
  SELECT vec_id,
         CAST(unnest(range(len(v))) AS BIGINT) AS i,
         unnest(v) AS x
  FROM e
),
variants AS (
  SELECT 'raw' AS variant, vec_id, i, x FROM ex
  UNION ALL
  SELECT 'matryoshka', vec_id, i, x * power(0.125, i // 16)
  FROM ex
),
norms AS (
  SELECT variant, vec_id,
         sqrt(SUM(x * x)) AS vnorm,
         sqrt(SUM(CASE WHEN i >= 16 THEN x * x ELSE 0 END)) AS rest
  FROM variants GROUP BY variant, vec_id
),
rm AS (
  SELECT variant,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(vnorm) FILTER (WHERE vnorm > 0) AS min_vnorm,
         quantile_cont(rest / vnorm, 0.95)
           FILTER (WHERE vnorm > 0) AS rest_mass_p95
  FROM norms GROUP BY variant
),
dims AS (
  SELECT variant, i, MIN(x) AS mn, MAX(x) AS mx
  FROM variants GROUP BY variant, i
),
dl AS (
  SELECT variant,
         sqrt(SUM(CASE WHEN mx > mn
           THEN ((mx - mn) / 256.0 / 2.0) * ((mx - mn) / 256.0 / 2.0)
           ELSE 0 END)) AS delta
  FROM dims GROUP BY variant
)
SELECT r.variant, r.n_rows,
       ROUND(r.rest_mass_p95, 4) AS rest_mass_p95,
       ROUND(d.delta, 4) AS delta,
       ROUND(r.min_vnorm, 4) AS min_vnorm,
       ROUND(2.0 * d.delta / r.min_vnorm, 4) AS sq8_margin,
       (r.rest_mass_p95 <= 0.35) AS viable_prefix,
       (2.0 * d.delta / r.min_vnorm <= 0.25 * 0.95) AS viable_sq8,
       CASE WHEN 2.0 * d.delta / r.min_vnorm <= 0.25 * 0.95 THEN 'sq8'
            WHEN r.rest_mass_p95 <= 0.35 THEN 'prefix'
            ELSE 'float' END AS rung
FROM rm r JOIN dl d USING (variant)
ORDER BY variant
"""


SQL_EMB_IVF_BALANCE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
h AS (
  SELECT vec_id, v,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
), cents AS (
  -- seeds from the UNFILTERED corpus, mirroring _ivf_centroids
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT v AS cv, hh FROM h ORDER BY hh LIMIT 4)
), nz AS (
  SELECT vec_id, v FROM e
  WHERE sqrt(list_dot_product(v, v)) > 0
), cap AS (
  SELECT CAST((COUNT(*) + 7) // 8 AS BIGINT) AS cap FROM nz
), a0 AS (
  SELECT vec_id, v, cell FROM (
    SELECT nz.vec_id, nz.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY nz.vec_id
             ORDER BY list_dot_product(nz.v, c.cv) DESC, c.cell) AS rn
    FROM nz CROSS JOIN cents c) WHERE rn = 1
), hot AS (
  SELECT cell FROM a0 CROSS JOIN cap
  GROUP BY cell, cap HAVING COUNT(*) > cap
), seeds AS (
  -- 2 md5-hash-order seed rows per hot cell (ties -> lower id)
  SELECT cell, srn, v FROM (
    SELECT a0.cell, a0.v,
           ROW_NUMBER() OVER (PARTITION BY a0.cell
             ORDER BY h.hh, a0.vec_id) AS srn
    FROM a0 JOIN h USING (vec_id) JOIN hot USING (cell)) WHERE srn <= 2
), final_cents AS (
  -- seed 1 replaces the hot centroid in place; seed 2 appends in
  -- ascending hot-cell order after the original list
  SELECT c.cell AS fc, COALESCE(s1.v, c.cv) AS cv
  FROM cents c LEFT JOIN (SELECT cell, v FROM seeds WHERE srn = 1) s1
    ON s1.cell = c.cell
  UNION ALL
  SELECT (SELECT COUNT(*) FROM cents)
         + ROW_NUMBER() OVER (ORDER BY cell) - 1 AS fc, v
  FROM seeds WHERE srn = 2
), a1 AS (
  SELECT vec_id, fc FROM (
    SELECT nz.vec_id, f.fc,
           ROW_NUMBER() OVER (PARTITION BY nz.vec_id
             ORDER BY list_dot_product(nz.v, f.cv) DESC, f.fc) AS rn
    FROM nz CROSS JOIN final_cents f) WHERE rn = 1
)
SELECT CAST(fc AS INT) AS cell, COUNT(*) AS n_rows
FROM a1 GROUP BY fc ORDER BY fc
"""


def q_j_interval_overlap(spark, sf_dir):
    """Interval × interval overlap join: user sessions (30-min gap)
    against daily 09:00-17:00 "office hour" windows — which sessions
    touch office hours, per user. Bin-and-equijoin on 1-hour bins with
    FIRST-COLLIDING-BIN pair emission (LSH-banding dedup move — no
    global distinct); oracle is the plain overlap theta-join."""
    from dataprocessingframework_spark.operators.joins import (
        interval_overlap_join,
    )

    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("long")
    prev = F.lag(epoch).over(w)
    is_new = F.when(
        prev.isNull() | ((epoch - prev) > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    sess = (
        ev.select("user_id", "event_id", "ts", is_new.alias("_new"))
        .withColumn("session_id", F.sum("_new").over(w))
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.col("ts").cast("long")).alias("s_lo"),
            F.max(F.col("ts").cast("long")).alias("s_hi"),
        )
    )
    office = (
        ev.select(F.to_date("ts").alias("day"))
        .distinct()
        .select(
            (F.col("day").cast("timestamp").cast("long") + 9 * 3600).alias(
                "o_lo"
            ),
            (F.col("day").cast("timestamp").cast("long") + 17 * 3600 - 1)
            .alias("o_hi"),
        )
    )
    pairs = interval_overlap_join(
        sess, office, "s_lo", "s_hi", "o_lo", "o_hi", bin_width=3600
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_office_overlaps"))
        .orderBy("user_id")
    )


SQL_J_INTERVAL_OVERLAP = """
WITH o AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
), sess AS (
  -- FLOOR: duckdb epoch() keeps fractional seconds, Spark's
  -- cast(ts AS long) truncates; a session bound with a sub-second
  -- fraction next to the 09:00/17:00 edge otherwise flips the
  -- overlap verdict between engines (surfaced by the r6 sf0.1
  -- spot-check — sf0.01 never sampled a boundary fraction)
  SELECT user_id, session_id,
         CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS s_lo,
         CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS s_hi
  FROM s GROUP BY user_id, session_id
), office AS (
  SELECT epoch(CAST(day AS TIMESTAMP)) + 9 * 3600 AS o_lo,
         epoch(CAST(day AS TIMESTAMP)) + 17 * 3600 - 1 AS o_hi
  FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
)
SELECT user_id, COUNT(*) AS n_office_overlaps
FROM sess JOIN office ON s_lo <= o_hi AND o_lo <= s_hi
GROUP BY user_id ORDER BY user_id
"""


def q_ev_ordered_funnel(spark, sf_dir):
    """STRICT ordered, time-constrained funnel (view -> click ->
    purchase, each step within 2 h of the previous): the production
    funnel ev_funnel's min-stage version cannot express (order and
    deadlines matter). Per-stage earliest-qualifying timestamps are
    per-user aggregates chained by user-keyed joins — three user-sized
    shuffles, never event × event."""
    ev = T(spark, sf_dir, "events")
    h2 = 2 * 3600

    def stage(etype):
        return ev.filter(F.col("event_type") == etype).select(
            "user_id", F.col("ts").cast("long").alias("t")
        )

    s1 = stage("view").groupBy("user_id").agg(F.min("t").alias("t1"))
    s2 = (
        stage("click")
        .join(s1, "user_id")
        .filter((F.col("t") >= F.col("t1")) & (F.col("t") <= F.col("t1") + h2))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    s3 = (
        stage("purchase")
        .join(s2, "user_id")
        .filter((F.col("t") >= F.col("t2")) & (F.col("t") <= F.col("t2") + h2))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click_2h")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase_2h")))
    )


SQL_EV_ORDERED_FUNNEL = """
-- floor(epoch(.)): the Spark side works on cast(ts AS long), i.e.
-- second-truncated stage times and deadlines; duckdb epoch() keeps
-- fractional seconds, which can flip a stage that lands within the
-- fraction of the 2h deadline (same class as the r6 sf0.1
-- j_interval_overlap finding — latent here, fixed preemptively)
WITH s1 AS (
  SELECT user_id, MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click'
    AND CAST(floor(epoch(e.ts)) AS BIGINT) >= s1.t1
    AND CAST(floor(epoch(e.ts)) AS BIGINT) <= s1.t1 + 7200
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase'
    AND CAST(floor(epoch(e.ts)) AS BIGINT) >= s2.t2
    AND CAST(floor(epoch(e.ts)) AS BIGINT) <= s2.t2 + 7200
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS n_view,
       (SELECT COUNT(*) FROM s2) AS n_click_2h,
       (SELECT COUNT(*) FROM s3) AS n_purchase_2h
"""


def q_pipeline_curation_v2(spark, sf_dir):
    """Second-generation curation flagship, composing the round-4
    tiers end-to-end: language+length gate -> exact dedup (keep-first
    by text) -> exact duplicated-SPAN removal (stride-1, Lee et al.
    class) -> minimum-surviving-tokens gate -> per-source corpus
    report. Every stage is an already-oracled operator; this query
    pins the COMPOSITION cross-engine. All shuffles are doc- or
    gram-keyed and linear; nothing quadratic anywhere."""
    docs = T(spark, sf_dir, "documents")
    gated = docs.filter((F.col("lang") == "en") & (F.col("n_chars") >= 50))
    w = Window.partitionBy("text").orderBy("doc_id")
    deduped = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    cleaned = text_analysis.remove_dup_spans(
        deduped, n=5, min_docs=2
    ).join(deduped.select("doc_id", "source"), "doc_id")
    survivors = cleaned.withColumn(
        "n_clean_tokens", text_analysis.token_count(F.col("clean_text"))
    ).filter(F.col("n_clean_tokens") >= 10)
    return (
        survivors.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_clean_tokens").alias("sum_clean_tokens"),
            F.sum("n_removed").alias("sum_removed_tokens"),
        )
        .orderBy("source")
    )


SQL_PIPELINE_CURATION_V2 = """
WITH base AS (
  SELECT doc_id, text, source FROM (
    SELECT doc_id, text, source,
           ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM documents WHERE lang = 'en' AND n_chars >= 50
  ) WHERE rn = 1
), toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM base
), occ AS (
  SELECT doc_id, i - 1 AS s, i + 3 AS e,
         CAST(concat('0x', substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))
              AS BIGINT) AS g
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
        FROM toks WHERE len(t) >= 5)
), dupg AS (
  SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS d FROM occ GROUP BY g)
  WHERE d >= 2
), hits AS (
  SELECT doc_id, s, e FROM occ SEMI JOIN dupg USING (g)
), flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR s > MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS new
  FROM hits
), spans AS (
  SELECT doc_id, span, MIN(s) AS s, MAX(e) AS e
  FROM (SELECT doc_id, s, e,
               SUM(new) OVER (PARTITION BY doc_id ORDER BY s) AS span
        FROM flagged)
  GROUP BY doc_id, span
), tokidx AS (
  SELECT doc_id, j - 1 AS idx, t[j] AS tok
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, GREATEST(len(t), 1))) AS j
        FROM toks)
  WHERE j <= len(t)
), kept AS (
  SELECT ti.doc_id, ti.idx, ti.tok FROM tokidx ti
  WHERE NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = ti.doc_id AND sp.s <= ti.idx AND ti.idx <= sp.e)
), agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text
  FROM kept GROUP BY doc_id
), rem AS (
  SELECT doc_id, CAST(SUM(e - s + 1) AS BIGINT) AS n_removed
  FROM spans GROUP BY doc_id
), cleaned AS (
  SELECT b.doc_id, b.source,
         COALESCE(a.clean_text, '') AS clean_text,
         COALESCE(r.n_removed, 0) AS n_removed
  FROM base b
  LEFT JOIN agg a ON a.doc_id = b.doc_id
  LEFT JOIN rem r ON r.doc_id = b.doc_id
), survivors AS (
  SELECT *, len(list_filter(string_split(clean_text, ' '), x -> x <> ''))
           AS n_clean_tokens
  FROM cleaned
  WHERE len(list_filter(string_split(clean_text, ' '), x -> x <> '')) >= 10
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_clean_tokens) AS BIGINT) AS sum_clean_tokens,
       CAST(SUM(n_removed) AS BIGINT) AS sum_removed_tokens
FROM survivors GROUP BY source ORDER BY source
"""


def q_a_mad_outliers(spark, sf_dir):
    """Robust dispersion report by median absolute deviation (the
    z-score's outlier-immune sibling): modified z = 0.6745*(x-med)/MAD
    (Iglewicz-Hoaglin, public). One-row report (median, MAD, max |z|,
    count above the 3.5 outlier bar — structurally zero on this
    uniform synthetic corpus, which the oracle pins too). Two exact-
    median aggregates broadcast back; the corpus never re-shuffles."""
    docs = T(spark, sf_dir, "documents")
    med = docs.agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    with_med = docs.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.expr("percentile(abs(n_chars - med), 0.5)").alias("mad"),
        F.first("med").alias("med"),
    )
    z = (
        F.lit(0.6745)
        * (F.col("n_chars") - F.col("med"))
        / F.col("mad")
    )
    return (
        docs.crossJoin(F.broadcast(mad))
        .withColumn("_z", z)
        .agg(
            F.round(F.first("med"), 2).alias("median"),
            F.round(F.first("mad"), 2).alias("mad"),
            F.round(F.max(F.abs(F.col("_z"))), 4).alias("max_abs_z"),
            F.sum(
                F.when(F.abs(F.col("_z")) > 3.5, 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


SQL_A_MAD_OUTLIERS = """
WITH med AS (
  SELECT quantile_cont(n_chars, 0.5) AS med FROM documents
), mad AS (
  SELECT quantile_cont(abs(n_chars - med), 0.5) AS mad,
         ANY_VALUE(med) AS med
  FROM documents, med
)
SELECT ROUND(ANY_VALUE(med), 2) AS median,
       ROUND(ANY_VALUE(mad), 2) AS mad,
       ROUND(MAX(abs(0.6745 * (n_chars - med) / mad)), 4) AS max_abs_z,
       CAST(SUM(CASE WHEN abs(0.6745 * (n_chars - med) / mad) > 3.5
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM documents, mad
"""


def q_f_gap_fill(spark, sf_dir):
    """Calendar gap-fill: daily event counts per type with MISSING
    days materialized as zero rows (the reporting-completeness move —
    a time series with holes breaks downstream windows). The day
    spine is a sequence() explode over the observed min/max — one
    single-row aggregate broadcast, never a driver loop."""
    ev = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = (
        bounds.select(
            F.explode(
                F.sequence(
                    F.col("d0"), F.col("d1"), F.expr("interval 1 day")
                )
            ).alias("day")
        )
        .crossJoin(
            spark.createDataFrame(
                [("purchase",), ("signup",)], "event_type string"
            )
        )
    )
    return (
        spine.join(daily, on=["day", "event_type"], how="left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
        .orderBy("day", "event_type")
    )


SQL_F_GAP_FILL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS cnt
  FROM events WHERE event_type IN ('purchase', 'signup')
  GROUP BY 1, 2
), bounds AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily
), spine AS (
  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day,
         t.event_type
  FROM bounds CROSS JOIN (
    SELECT unnest(['purchase', 'signup']) AS event_type) t
)
SELECT s.day, s.event_type, COALESCE(d.cnt, 0) AS cnt
FROM spine s LEFT JOIN daily d
  ON d.day = s.day AND d.event_type = s.event_type
ORDER BY s.day, s.event_type
"""


def q_ev_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per month (the engagement staple): mean
    daily-distinct over monthly-distinct users. Both sides reduce to
    (period, user) DISTINCT tables first — shuffles carry distinct
    pairs, never raw events."""
    ev = T(spark, sf_dir, "events")
    dau = (
        ev.select(
            F.to_date("ts").alias("day"),
            F.trunc(F.to_date("ts"), "month").alias("month"),
            "user_id",
        )
        .distinct()
        .groupBy("month", "day")
        .agg(F.count(F.lit(1)).alias("dau"))
        .groupBy("month")
        .agg(F.avg("dau").alias("avg_dau"))
    )
    mau = (
        ev.select(
            F.trunc(F.to_date("ts"), "month").alias("month"), "user_id"
        )
        .distinct()
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("mau"))
    )
    return (
        dau.join(mau, "month")
        .select(
            "month",
            F.round("avg_dau", 2).alias("avg_dau"),
            "mau",
            F.round(F.col("avg_dau") / F.col("mau"), 4).alias("stickiness"),
        )
        .orderBy("month")
    )


SQL_EV_STICKINESS = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day,
         date_trunc('month', CAST(ts AS DATE)) AS month, user_id
  FROM events
), dau AS (
  SELECT month, AVG(dau) AS avg_dau FROM (
    SELECT month, day, COUNT(*) AS dau FROM du GROUP BY month, day)
  GROUP BY month
), mau AS (
  SELECT month, COUNT(*) AS mau FROM (
    SELECT DISTINCT month, user_id FROM du) GROUP BY month
)
SELECT CAST(dau.month AS DATE) AS month,
       ROUND(avg_dau, 2) AS avg_dau, mau,
       ROUND(avg_dau / mau, 4) AS stickiness
FROM dau JOIN mau ON dau.month = mau.month
ORDER BY month
"""


def q_tx_hapax_ratio(spark, sf_dir):
    """Lexical richness per source: hapax-legomena share (fraction of
    the source's vocabulary occurring exactly once) + type-token
    ratio. Template-generated or boilerplate corpora collapse both.
    One (source, term) count table drives everything."""
    docs = T(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source",
            F.explode(text_analysis.tokens(F.col("text"))).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        tc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            F.sum("c").alias("tokens"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax"),
        )
        .select(
            "source",
            "vocab",
            "tokens",
            "hapax",
            F.round(F.col("hapax") / F.col("vocab"), 4).alias("hapax_ratio"),
            F.round(F.col("vocab") / F.col("tokens"), 4).alias(
                "type_token_ratio"
            ),
        )
        .orderBy("source")
    )


SQL_TX_HAPAX_RATIO = """
WITH tc AS (
  SELECT source, term, COUNT(*) AS c FROM (
    SELECT source, unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS term
    FROM documents)
  GROUP BY source, term
)
SELECT source, COUNT(*) AS vocab,
       CAST(SUM(c) AS BIGINT) AS tokens,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS hapax_ratio,
       ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 4) AS type_token_ratio
FROM tc GROUP BY source ORDER BY source
"""


def q_ev_dominant_users(spark, sf_dir):
    """TPC-H Q20 shape on the events stream: a dimension semi-joined on
    an aggregated threshold from the fact table (Q20: suppliers whose
    availability beats half a part's shipped volume; here: customers
    who account for >1% of ANY event_type's total value — the
    per-category heavy hitters a throttling/abuse pipeline flags).
    Rounds out the correlated-subquery surface next to h4 (EXISTS) and
    h21 (anti-exists) without the absent partsupp table.

    Scale shape: the correlated subquery is decorrelated by
    construction — per-(user, type) sums are ONE groupBy with map-side
    combine (shuffle volume = distinct user x type, not events); the
    per-type totals (n_types rows) broadcast onto them; the qualifying
    user set then left-semi-joins the customer dim on its key. The
    fact table is scanned once for each aggregate, never re-scanned
    per dimension row. Sums are exact DECIMAL(18,2) so the threshold
    comparison is order-independent and bit-identical to the oracle
    (double sums could flip a boundary user between engines);
    the x100 comparison keeps it in integer-exact decimal arithmetic.
    """
    ev = T(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    per_user_type = ev.groupBy("user_id", "event_type").agg(
        F.sum("v").alias("user_value")
    )
    per_type = ev.groupBy("event_type").agg(F.sum("v").alias("total_value"))
    qualifying = (
        per_user_type.join(F.broadcast(per_type), "event_type")
        .filter(F.col("user_value") * 100 > F.col("total_value"))
        .select("user_id")
        .distinct()
    )
    cust = T(spark, sf_dir, "customer")
    return (
        cust.join(
            qualifying,
            cust["c_custkey"] == qualifying["user_id"],
            "left_semi",
        )
        .select(F.col("c_custkey").alias("user_id"), F.col("c_name").alias("name"))
        .orderBy("user_id")
    )


def q_tx_quality_classifier(spark, sf_dir):
    """Model-based quality gate, deterministic form: fastText-style
    hashed-linear scorer (see text_analysis.hashed_linear_score).
    Entirely narrow — the whole scoring path fuses into the documents
    scan with zero shuffle; the integer-exact pool keeps the score
    bit-identical across engines."""
    return text_analysis.hashed_linear_score(
        T(spark, sf_dir, "documents")
    ).orderBy("doc_id")


SQL_TX_QUALITY_CLASSIFIER = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), scored AS (
  SELECT doc_id,
    CASE WHEN len(t) > 0 THEN
      CAST(list_sum(list_transform(t, tok ->
        CAST(concat('0x', substr(md5(concat('qw|', CAST(
          CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % 1024
        AS VARCHAR))), 1, 15)) AS BIGINT) % 2001 - 1000
      )) AS DOUBLE) / (len(t) * 1000.0)
    ELSE 0.0 END AS mean
  FROM toks
)
SELECT doc_id, ROUND(1/(1+EXP(-mean)), 4) AS score,
       ROUND(1/(1+EXP(-mean)), 4) >= 0.5 AS keep
FROM scored ORDER BY doc_id
"""


SQL_EV_DOMINANT_USERS = """
WITH ev AS (
  SELECT user_id, event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events
), per_user_type AS (
  SELECT user_id, event_type, SUM(v) AS user_value
  FROM ev GROUP BY user_id, event_type
), per_type AS (
  SELECT event_type, SUM(v) AS total_value FROM ev GROUP BY event_type
), qualifying AS (
  SELECT DISTINCT user_id
  FROM per_user_type j JOIN per_type t USING (event_type)
  WHERE j.user_value * 100 > t.total_value
)
SELECT c.c_custkey AS user_id, c.c_name AS name
FROM customer c SEMI JOIN qualifying q ON c.c_custkey = q.user_id
ORDER BY user_id
"""


def q_stream_near_dup_ingest(spark, sf_dir):
    """Continuous NEAR-dup-gated ingestion under the oracle: documents
    arrive in two waves; wave 2 docs are dropped iff they LSH-collide
    with an accepted wave-1 doc in >= 1 band AND verify at exact
    word-set Jaccard >= 0.5 (the real fuzzy-ingest decision — sketch
    prune + exact verify — running inside a checkpointed foreachBatch
    stream). The md5-portable minhash bands make even the approximate
    candidate condition replicable in SQL, so the streamed kept-set is
    hash-checked end-to-end. Within-wave near-dups are kept (the
    incremental contract). Output: per-source kept counts + min id.
    """
    import shutil
    import uuid

    from dataprocessingframework_spark.streaming import (
        incremental_near_dup_ingest,
        read_corpus,
    )

    base = f"/root/repo/.scratch/stream_nd_{uuid.uuid4().hex[:8]}"
    src, corpus, ckpt = f"{base}/src", f"{base}/corpus", f"{base}/ckpt"
    docs = T(spark, sf_dir, "documents").select("doc_id", "text", "source")
    # engine-exact wave cut (the oracle replicates it with integer
    # arithmetic; a percentile cut could disagree across engines)
    cut = (docs.agg(F.max("doc_id")).collect()[0][0] + 1) // 2
    schema = "doc_id long, text string, source string"

    def run():
        return incremental_near_dup_ingest(
            spark, src, schema, corpus, ckpt,
            text_col="text", id_col="doc_id",
            threshold=0.5, num_hashes=8, bands=4,
        )

    try:
        docs.filter(F.col("doc_id") < cut).write.mode("append").json(src)
        run()
        docs.filter(F.col("doc_id") >= cut).write.mode("append").json(src)
        run()
        res = (
            read_corpus(spark, corpus)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.min("doc_id").alias("min_doc_id"),
            )
            .orderBy("source")
        )
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_emb_kcenter(spark, sf_dir):
    """Greedy farthest-point (k-center) diverse-subset selection over
    the embedding corpus (r8) — the data-pruning/coreset pick. The
    md5-hash-min seed + identical fold arithmetic + (dist DESC, id)
    tiebreak make every round deterministic and engine-portable, so
    the whole greedy trajectory gets a FULL oracle (unrolled per-round
    CTEs in SQL). Output (sel_rank, vec_id, dist): the coverage-radius
    sequence; seed reports max cosine distance 2.0."""
    emb = T(spark, sf_dir, "embeddings")
    return similarity.kcenter_select(emb, k=5).orderBy("sel_rank")


def q_emb_kcenter_batched(spark, sf_dir):
    """Pooled-batch k-center (r11) — driver coverage for the
    batch_m>1 large-k path (similarity.kcenter_select batched
    branch: TakeOrdered pool collect + exact within-pool greedy +
    per-pick pool distance updates + batched checkpoint cadence).
    pool_factor=512 makes the per-round pool (512*batch_m rows)
    cover the whole corpus at every test SF (2000 rows at sf0.1),
    so the pooled trajectory IS exact greedy (pinned in
    tests/test_operators.py test_kcenter_batched_full_pool_
    matches_exact) and the run carries the same FULL unrolled-CTE
    oracle as emb_kcenter. Exercises two pooled rounds (k=8,
    batch_m=4) plus the ckpt_rounds=1 checkpoint path."""
    emb = T(spark, sf_dir, "embeddings")
    return similarity.kcenter_select(
        emb, k=8, batch_m=4, pool_factor=512, checkpoint_every=4
    ).orderBy("sel_rank")


def _kcenter_sql(k: int = 5) -> str:
    steps = []
    prev_d, prev_sel = "d1", "s0"
    steps.append("""d1 AS (
  SELECT b.vec_id, b.v, b.n,
         1.0 - list_dot_product(b.v, s.v) / (b.n * s.n) AS d
  FROM b, s0 s WHERE b.vec_id <> s.vec_id
)""")
    selects = ["SELECT 0 AS sel_rank, vec_id, 2.0 AS dist FROM s0"]
    for r in range(1, k):
        sel = f"s{r}"
        steps.append(f"""{sel} AS (
  SELECT vec_id, v, n, d FROM {prev_d} ORDER BY d DESC, vec_id LIMIT 1
)""")
        selects.append(
            f"SELECT {r} AS sel_rank, vec_id, ROUND(d, 4) AS dist FROM {sel}"
        )
        if r < k - 1:
            nxt = f"d{r + 1}"
            steps.append(f"""{nxt} AS (
  SELECT p.vec_id, p.v, p.n,
         LEAST(p.d, 1.0 - list_dot_product(p.v, s.v) / (p.n * s.n)) AS d
  FROM {prev_d} p, {sel} s WHERE p.vec_id <> s.vec_id
)""")
            prev_d = nxt
    return (
        """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b0 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
b AS (SELECT vec_id, v, n FROM b0 WHERE n > 0),
h AS (
  SELECT vec_id, v, n,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM b
),
s0 AS (SELECT vec_id, v, n FROM h ORDER BY hh, vec_id LIMIT 1),
"""
        + ",\n".join(steps)
        + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY sel_rank"
    )


def q_stream_semantic_ingest(spark, sf_dir):
    """Continuous SEMANTIC-dup-gated ingestion under the oracle (r8):
    embeddings arrive in two waves; a wave-2 vector is dropped iff an
    accepted wave-1 vector in one of its 2 nearest IVF cells has
    cosine >= 0.4 — the embedding twin of stream_near_dup_ingest,
    running the IVF-cell-blocked gate inside a checkpointed
    foreachBatch stream. The iters=0 hash-seeded quantizer (same
    construction as emb_ivf_topk_seeded) makes cell assignment,
    probing, and the cosine gate pure portable arithmetic, so the
    streamed kept-set is hash-checked end-to-end. The source/corpus
    round-trip is parquet (bit-exact floats; JSON would perturb
    them). Within-wave semantic dups are kept (the incremental
    contract). Output: per-wave kept counts + id range."""
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.similarity import (
        _ivf_centroids,
    )
    from dataprocessingframework_spark.streaming import (
        incremental_semantic_ingest,
        read_corpus,
    )

    base = f"/root/repo/.scratch/stream_sem_{uuid.uuid4().hex[:8]}"
    src, corpus, ckpt = f"{base}/src", f"{base}/corpus", f"{base}/ckpt"
    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cut = (emb.agg(F.max("vec_id")).collect()[0][0] + 1) // 2
    cents = _ivf_centroids(emb, "vec_id", "embedding", 16, iters=0)
    schema = "vec_id long, embedding array<float>"

    def run():
        return incremental_semantic_ingest(
            spark, src, schema, corpus, ckpt, cents,
            vec_col="embedding", id_col="vec_id",
            threshold=0.4, n_probe=2, impl="jvm",
            src_format="parquet",
        )

    try:
        emb.filter(F.col("vec_id") < cut).write.mode("append").parquet(src)
        run()
        emb.filter(F.col("vec_id") >= cut).write.mode("append").parquet(src)
        run()
        res = (
            read_corpus(spark, corpus)
            .select(
                F.when(F.col("vec_id") < cut, 0).otherwise(1).alias("wave"),
                "vec_id",
            )
            .groupBy("wave")
            .agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.min("vec_id").alias("min_id"),
                F.max("vec_id").alias("max_id"),
            )
            .orderBy("wave")
        )
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_STREAM_SEMANTIC_INGEST = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cutoff AS (SELECT (MAX(vec_id) + 1) // 2 AS cut FROM e),
h AS (
  SELECT vec_id, v,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hh
  FROM e
), cents AS (
  SELECT cv, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cell FROM (
    SELECT v AS cv, hh FROM h ORDER BY hh LIMIT 16)
), corpus_cells AS (
  SELECT c_id, cvv, cn, cell FROM (
    SELECT e.vec_id AS c_id, e.v AS cvv,
           sqrt(list_dot_product(e.v, e.v)) AS cn, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
    FROM e CROSS JOIN cents c CROSS JOIN cutoff
    WHERE e.vec_id < cut) WHERE rn = 1 AND cn > 0
), probes AS (
  SELECT b_id, bv, bn, cell FROM (
    SELECT e.vec_id AS b_id, e.v AS bv,
           sqrt(list_dot_product(e.v, e.v)) AS bn, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell) AS rn
    FROM e CROSS JOIN cents c CROSS JOIN cutoff
    WHERE e.vec_id >= cut) WHERE rn <= 2 AND bn > 0
), dropped AS (
  SELECT DISTINCT p.b_id FROM probes p JOIN corpus_cells c USING (cell)
  WHERE list_dot_product(p.bv, c.cvv) / (p.bn * c.cn) >= 0.4
), kept AS (
  SELECT vec_id, 0 AS wave FROM e CROSS JOIN cutoff WHERE vec_id < cut
  UNION ALL
  SELECT vec_id, 1 AS wave FROM e CROSS JOIN cutoff
  WHERE vec_id >= cut AND vec_id NOT IN (SELECT b_id FROM dropped)
)
SELECT wave, COUNT(*) AS n_kept, MIN(vec_id) AS min_id,
       MAX(vec_id) AS max_id
FROM kept GROUP BY wave ORDER BY wave
"""


def _near_dup_ingest_sql() -> str:
    return f"""
WITH cutoff AS (
  SELECT (MAX(doc_id) + 1) // 2 AS cut FROM documents
),
sig AS ({_minhash_sql(8).replace(" ORDER BY doc_id", "")}),
buckets AS ({_lsh_band_sql(8, 4)}),
cand AS (
  SELECT b2.doc_id AS id_new, b1.doc_id AS id_old
  FROM buckets b2 JOIN buckets b1
    ON b2.band = b1.band AND b2.bucket = b1.bucket
  CROSS JOIN cutoff
  WHERE b2.doc_id >= cut AND b1.doc_id < cut
  GROUP BY 1, 2
),
{_WORDS_CTE.removeprefix("WITH ")},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
inter AS (
  SELECT c.id_new, c.id_old, COUNT(*) AS i
  FROM cand c
  JOIN words a ON a.doc_id = c.id_new
  JOIN words b ON b.doc_id = c.id_old AND b.w = a.w
  GROUP BY 1, 2
),
dropped AS (
  SELECT DISTINCT i.id_new AS doc_id
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_new
  JOIN sizes sb ON sb.doc_id = i.id_old
  WHERE CAST(i.i AS DOUBLE)/(sa.n + sb.n - i.i) >= 0.5
),
kept AS (
  SELECT d.doc_id, d.source FROM documents d CROSS JOIN cutoff
  WHERE d.doc_id < cut
     OR d.doc_id NOT IN (SELECT doc_id FROM dropped)
)
SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_doc_id
FROM kept GROUP BY source ORDER BY source
"""


def q_ev_engagement_profile(spark, sf_dir):
    """TPC-H Q16 shape on the events stream: grouped COUNT(DISTINCT)
    over a dimension pair, EXCLUDING members failing a blacklist
    subquery (Q16: part attrs x distinct suppliers, minus complaint
    suppliers; here: event_type x weekday x distinct engaged users,
    minus heavy-error users, >= 15 error events). Completes the
    partsupp-blocked
    correlated-subquery family next to h4 (EXISTS), h21 (anti-exists)
    and ev_dominant_users (aggregated threshold).

    Scale shape: the blacklist reduces to distinct user_ids of error
    events (small) and anti-joins the fact rows BEFORE aggregation —
    one broadcastable anti-join, then a single groupBy whose
    count-distinct is partial-aggregated map-side. No correlated
    re-scan.
    """
    ev = T(spark, sf_dir, "events")
    error_users = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_err"))
        .filter(F.col("n_err") >= 15)
        .select("user_id")
    )
    return (
        ev.filter(F.col("event_type") != "error")
        .join(error_users, "user_id", "left_anti")
        .select(
            "event_type",
            F.dayofweek("ts").cast("long").alias("weekday"),
            "user_id",
        )
        .groupBy("event_type", "weekday")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type", "weekday")
    )


SQL_EV_ENGAGEMENT_PROFILE = """
WITH error_users AS (
  SELECT user_id FROM (
    SELECT user_id, COUNT(*) AS n_err FROM events
    WHERE event_type = 'error' GROUP BY user_id)
  WHERE n_err >= 15
)
SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS weekday,
       COUNT(DISTINCT user_id) AS n_users
FROM events
WHERE event_type <> 'error'
  AND user_id NOT IN (SELECT user_id FROM error_users)
GROUP BY event_type, weekday
ORDER BY event_type, weekday
"""


def q_stream_quality_gate(spark, sf_dir):
    """Streaming MODEL-gated curation: documents arrive in two waves;
    every micro-batch is scored by the hashed-linear quality
    classifier (a zero-shuffle column expression — the deterministic
    stand-in for a fastText gate), only keep-scoring rows enter the
    corpus, with exact text dedup against everything already curated
    and keep-first within the batch. Because wave 1 holds the lower
    doc_id range, the composition equals a global keep-min-doc_id per
    text over gated docs — which is exactly the SQL oracle. Final
    per-source report re-derives each kept doc's score from its text
    (deterministic), so the whole model-in-the-stream path is
    hash-checked end-to-end.
    """
    import shutil
    import uuid

    from dataprocessingframework_spark.operators.text_analysis import (
        hashed_linear_score_col,
    )
    from dataprocessingframework_spark.streaming import (
        incremental_curation,
        read_corpus,
    )

    base = f"/root/repo/.scratch/stream_qg_{uuid.uuid4().hex[:8]}"
    src, corpus, ckpt = f"{base}/src", f"{base}/corpus", f"{base}/ckpt"
    docs = T(spark, sf_dir, "documents").select("doc_id", "text", "source")
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    schema = "doc_id long, text string, source string"
    score = F.round(hashed_linear_score_col(F.col("text")), 4)

    def run():
        return incremental_curation(
            spark, src, schema, corpus, ckpt,
            dedup_cols=["text"], order_col="doc_id",
            curate=lambda df: df.filter(
                F.round(hashed_linear_score_col(F.col("text")), 4) >= 0.5
            ),
        )

    try:
        docs.filter(F.col("doc_id") < cut).write.mode("append").json(src)
        run()
        docs.filter(F.col("doc_id") >= cut).write.mode("append").json(src)
        run()
        res = (
            read_corpus(spark, corpus)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.round(F.avg(score), 4).alias("avg_score"),
                F.min("doc_id").alias("min_doc_id"),
            )
            .orderBy("source")
        )
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_STREAM_QUALITY_GATE = """
WITH toks AS (
  SELECT doc_id, source, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), scored AS (
  SELECT doc_id, source, text,
    ROUND(1/(1+EXP(-(CASE WHEN len(t) > 0 THEN
      CAST(list_sum(list_transform(t, tok ->
        CAST(concat('0x', substr(md5(concat('qw|', CAST(
          CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % 1024
        AS VARCHAR))), 1, 15)) AS BIGINT) % 2001 - 1000
      )) AS DOUBLE) / (len(t) * 1000.0)
    ELSE 0.0 END))), 4) AS score
  FROM toks
), kept AS (
  SELECT doc_id, source, score,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM scored WHERE score >= 0.5
)
SELECT source, COUNT(*) AS n_docs, ROUND(AVG(score), 4) AS avg_score,
       MIN(doc_id) AS min_doc_id
FROM kept WHERE rn = 1 GROUP BY source ORDER BY source
"""


def q_dd_semantic_vs_lexical(spark, sf_dir):
    """Cross-modal dedup triage: embedding near-dup candidate pairs
    (hyperplane-LSH bucketed — sub-quadratic, same-bucket only) joined
    against the exact word-set Jaccard of the same pairs' documents,
    classifying each pair as lexical (high Jaccard — text dedup alone
    would catch it) or semantic-only (paraphrase-class — only the
    embedding space sees it). The audit that tells a curation pipeline
    whether it still needs an embedding dedup tier after MinHash.

    Scale shape: the pair space is LSH-bucket-pruned before any
    scoring; Jaccard verification runs only over candidate docs
    (semi-joined down inside jaccard_pairs); the final classification
    join is candidate-pair-sized. FULL oracle: DuckDB recomputes the
    md5-derived hyperplanes, buckets, cosines, and Jaccards.
    """
    docs = T(spark, sf_dir, "documents")
    emb = T(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_near_dup_pairs(emb, threshold=0.2)
    jac = dedup.jaccard_pairs(
        docs, "text", "doc_id", threshold=0.0, candidates=pairs
    )
    return (
        pairs.join(jac, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            "cos",
            F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("jaccard"),
            (
                F.coalesce(F.col("jaccard"), F.lit(0.0)) >= 0.5
            ).alias("lexical"),
        )
        .orderBy("id_a", "id_b")
    )


SQL_DD_SEMANTIC_VS_LEXICAL = """
WITH pl AS (
  SELECT p, list_transform(range(0, 64), d ->
      (CAST(concat('0x', substr(md5('plane:' || p || ':' || d), 1, 15))
            AS BIGINT) % 2000001) / 1000000.0 - 1.0) AS v
  FROM range(0, 8) t(p)
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
bucketed AS (
  SELECT e.vec_id, e.v,
         CAST(SUM(CASE WHEN list_dot_product(e.v, pl.v) >= 0
                       THEN 1 << pl.p ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN pl GROUP BY e.vec_id, e.v
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v) /
           (sqrt(list_dot_product(a.v, a.v)) *
            sqrt(list_dot_product(b.v, b.v))) AS cos_raw
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) *
           sqrt(list_dot_product(b.v, b.v))) >= 0.2
),
cdocs AS (
  SELECT id_a AS doc_id FROM pairs
  UNION SELECT id_b FROM pairs
),
words AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    SEMI JOIN cdocs USING (doc_id)
  ) WHERE w <> ''
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT i.id_a, i.id_b,
         ROUND(CAST(i.i AS DOUBLE)/(sa.n + sb.n - i.i), 4) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
)
SELECT p.id_a, p.id_b, ROUND(p.cos_raw, 4) AS cos,
       COALESCE(j.jaccard, 0.0) AS jaccard,
       COALESCE(j.jaccard, 0.0) >= 0.5 AS lexical
FROM pairs p
LEFT JOIN jac j ON j.id_a = p.id_a AND j.id_b = p.id_b
ORDER BY p.id_a, p.id_b
"""


def q_dd_minhash_calibration(spark, sf_dir):
    """Minhash estimator calibration curve — the dedup-tier twin of
    emb_ann_recall: for every LSH candidate pair, the signature-
    agreement estimate (n_equal/k) is binned against the exact word-set
    Jaccard, yielding the per-bin pair count and mean true similarity.
    The audit a production pipeline runs before trusting banding
    parameters (k, bands) at 100 TB.

    Scale shape: signatures and candidates reuse the standard one-
    shuffle builds; the estimate join adds two doc-keyed hash joins of
    the (doc-sized) signature table onto the (candidate-sized) pair
    relation; the final rollup is an 8-row aggregate. n_equal is an
    integer so the binning is exact; only per-bin means are float.
    """
    docs = T(spark, sf_dir, "documents")
    k = 8
    sig = dedup.minhash_signatures(docs, "text", "doc_id", num_hashes=k)
    cand = dedup.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=8, bands=4, max_bucket_size=None,
        bucket_key="md5",
    )
    jac = dedup.jaccard_pairs(
        docs, "text", "doc_id", threshold=0.0, candidates=cand
    )
    a = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)],
    )
    b = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)],
    )
    n_equal = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(k)
    )
    return (
        jac.join(a, "id_a")
        .join(b, "id_b")
        .select("jaccard", n_equal.alias("n_equal"))
        .groupBy("n_equal")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jaccard"), 4).alias("avg_true_jaccard"),
        )
        .select(
            F.col("n_equal").cast("long").alias("n_equal"),
            F.round(F.col("n_equal") / float(k), 4).alias("est_jaccard"),
            "n_pairs",
            "avg_true_jaccard",
        )
        .orderBy("n_equal")
    )


SQL_DD_MINHASH_CALIBRATION = f"""
WITH sig AS ({_minhash_sql(8).replace(" ORDER BY doc_id", "")}),
buckets AS ({_lsh_band_sql(8, 4)}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
                AND a.doc_id < b.doc_id),
{_WORDS_CTE.removeprefix("WITH ")},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM words GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT i.id_a, i.id_b,
         ROUND(CAST(i.i AS DOUBLE)/(sa.n + sb.n - i.i), 4) AS jaccard
  FROM inter i
  JOIN cand c ON c.id_a = i.id_a AND c.id_b = i.id_b
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
),
est AS (
  SELECT j.jaccard,
         ({" + ".join(f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(8))}) AS n_equal
  FROM jac j
  JOIN sig a ON a.doc_id = j.id_a
  JOIN sig b ON b.doc_id = j.id_b
)
SELECT CAST(n_equal AS BIGINT) AS n_equal,
       ROUND(n_equal / 8.0, 4) AS est_jaccard,
       COUNT(*) AS n_pairs,
       ROUND(AVG(jaccard), 4) AS avg_true_jaccard
FROM est GROUP BY n_equal ORDER BY n_equal
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

# Ordering contract: the driver's correctness gate checks the FIRST 50
# entries. Entries already driver-green in CORRECTNESS_r01/r02/r03 sit
# below the fold; the window holds everything not yet driver-checked
# plus any newly added query. New queries go in positions 1-50, never
# appended.
#
# r4 WINDOW (rotation executed per VERDICT r3 item 1): the 29 entries
# judge-local-green in round 3 + the 3 rows-only embedding entries,
# followed by new round-4 queries. The 50 r3-green entries rotate down
# to the "driver-green in CORRECTNESS_r03" block.
REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {
    # -- round-3 additions awaiting driver confirmation ---------------
    "d_hash_sample": (q_d_hash_sample, SQL_D_HASH_SAMPLE),
    "w_jsonl_roundtrip": (q_w_jsonl_roundtrip, SQL_W_JSONL_ROUNDTRIP),
    "h4_priority_exists": (q_h4_priority_exists, SQL_H4),
    "h10_returned_items": (q_h10_returned_items, SQL_H10),
    "h12_priority_by_status": (q_h12_priority_by_status, SQL_H12),
    "h21_waiting_suppliers": (q_h21_waiting_suppliers, SQL_H21),
    "tx_tfidf": (q_tx_tfidf, SQL_TX_TFIDF),
    "tx_zipf": (q_tx_zipf, SQL_TX_ZIPF),
    "emb_label_centroids": (q_emb_label_centroids, SQL_EMB_LABEL_CENTROIDS),
    "stream_interval_join": (q_stream_interval_join, SQL_STREAM_INTERVAL_JOIN),
    "w_convert_formats": (q_w_convert_formats, SQL_W_CONVERT_FORMATS),
    "a_approx_sketches": (q_a_approx_sketches, SQL_A_APPROX_SKETCHES),
    "ev_funnel": (q_ev_funnel, SQL_EV_FUNNEL),
    "a_pivot": (q_a_pivot, SQL_A_PIVOT),
    "f_unpivot": (q_f_unpivot, SQL_F_UNPIVOT),
    "stream_curation": (q_stream_curation, SQL_STREAM_CURATION),
    "emb_ann_recall": (q_emb_ann_recall, SQL_EMB_ANN_RECALL),
    "emb_gate_recall": (q_emb_gate_recall, SQL_EMB_GATE_RECALL),
    "emb_gate_sq8": (q_emb_gate_sq8, SQL_EMB_GATE_SQ8),
    "emb_gate_sq8_stats": (q_emb_gate_sq8_stats, SQL_EMB_GATE_SQ8_STATS),
    "emb_gate_prefix": (q_emb_gate_prefix, SQL_EMB_GATE_PREFIX),
    "emb_gate_prefix_report": (
        q_emb_gate_prefix_report,
        SQL_EMB_GATE_PREFIX_REPORT,
    ),
    "emb_gate_pq": (q_emb_gate_pq, SQL_EMB_GATE_PQ),
    "emb_gate_margin_report": (
        q_emb_gate_margin_report,
        SQL_EMB_GATE_MARGIN_REPORT,
    ),
    "emb_gate_pq_margin_report": (
        q_emb_gate_pq_margin_report,
        SQL_EMB_GATE_PQ_MARGIN_REPORT,
    ),
    "emb_gate_blas_parity": (
        q_emb_gate_blas_parity,
        SQL_EMB_GATE_BLAS_PARITY,
    ),
    "d_temperature_sample": (q_d_temperature_sample, SQL_D_TEMPERATURE_SAMPLE),
    "d_per_group_sample": (q_d_per_group_sample, SQL_D_PER_GROUP_SAMPLE),
    "dd_incremental_near_dup": (
        q_dd_incremental_near_dup,
        SQL_DD_INCREMENTAL_NEAR_DUP,
    ),
    "tx_unigram_nll": (q_tx_unigram_nll, SQL_TX_UNIGRAM_NLL),
    "a_corr_matrix": (q_a_corr_matrix, SQL_A_CORR_MATRIX),
    "w_hive_partitioned": (q_w_hive_partitioned, SQL_W_HIVE_PARTITIONED),
    "tx_budget_mix": (q_tx_budget_mix, SQL_TX_BUDGET_MIX),
    "d_stratified_sample": (q_d_stratified_sample, SQL_D_STRATIFIED),
    "dd_incremental": (q_dd_incremental, SQL_DD_INCREMENTAL),
    "stream_enriched_agg": (q_stream_enriched, SQL_STREAM_ENRICHED),
    "tx_dup_passages": (q_tx_dup_passages, SQL_TX_DUP_PASSAGES),
    "tx_pack_sequences": (q_tx_pack_sequences, SQL_TX_PACK_SEQUENCES),
    # emb_lsh_topk was rows-only through r3; the multi-probe LSH path
    # is deterministic (md5-derived hyperplanes), so r4 gives it a
    # FULL oracle that recomputes planes/buckets/probes in DuckDB.
    "emb_lsh_topk": (q_emb_lsh_topk, SQL_EMB_LSH_TOPK),
    "emb_lsh_multi_topk": (q_emb_lsh_multi_topk, SQL_EMB_LSH_MULTI_TOPK),
    "emb_lsh_index_topk": (q_emb_lsh_index_topk, SQL_EMB_LSH_MULTI_TOPK),
    # rows-only by design (driver records a rows-only check):
    # IVF centroids come from distributed Lloyd averaging whose
    # float-sum order is partitioning-dependent — no bit-stable twin.
    "emb_ivf_topk": (q_emb_ivf_topk, SQL_EMB_IVF_TOPK),
    "emb_kmeans": (q_emb_kmeans, SQL_EMB_KMEANS),
    # -- new in round 4 ----------------------------------------------
    "ev_sessionize": (q_ev_sessionize, SQL_EV_SESSIONIZE),
    "ev_retention": (q_ev_retention, SQL_EV_RETENTION),
    "ev_attribution": (q_ev_attribution, SQL_EV_ATTRIBUTION),
    "ev_top_paths": (q_ev_top_paths, SQL_EV_TOP_PATHS),
    "w_rolling_revenue": (q_w_rolling_revenue, SQL_W_ROLLING_REVENUE),
    "tx_lang_mix": (q_tx_lang_mix, SQL_TX_LANG_MIX),
    "tx_filter_funnel": (q_tx_filter_funnel, SQL_TX_FILTER_FUNNEL),
    "f_ngram_profile": (q_f_ngram_profile, SQL_F_NGRAM_PROFILE),
    "a_mode_per_group": (q_a_mode_per_group, SQL_A_MODE_PER_GROUP),
    "w_bucketed_join": (q_w_bucketed_join, SQL_W_BUCKETED_JOIN),
    "j_full_outer": (q_j_full_outer, SQL_J_FULL_OUTER),
    "d_split_assign": (q_d_split_assign, SQL_D_SPLIT_ASSIGN),
    "tx_nll_buckets": (q_tx_nll_buckets, SQL_TX_NLL_BUCKETS),
    "ev_anomaly_days": (q_ev_anomaly_days, SQL_EV_ANOMALY_DAYS),
    "ev_quartiles_by_type": (q_ev_quartiles_by_type, SQL_EV_QUARTILES_BY_TYPE),
    "tx_keyword_search": (q_tx_keyword_search, SQL_TX_KEYWORD_SEARCH),
    "w_merge_upsert": (q_w_merge_upsert, SQL_W_MERGE_UPSERT),
    "a_top_docs_per_source": (q_a_top_docs_per_source, SQL_A_TOP_DOCS_PER_SOURCE),
    # ================= driver window ends here (50) =================
    # ROTATION LEDGER: window A (relational surface) driver-green in
    # r1/r2; window B (dedup/similarity/TPC-H/streaming/curation)
    # driver-green in r3; window C (above) is the r4 window. Standing
    # rule: new queries enter positions 1-50 the round they are
    # written; when the window is already full of never-checked
    # entries (as in r4), late additions queue HERE at the top of the
    # below-window block and lead the r5 rotation.
    # ROTATION PLAN FOR r5: this queue now holds the 13 pre-r4 entries
    # plus the ~22 round-4 additions (bloom decontamination, chunking,
    # A-ES sampling, snapshot diff/SCD2, nearest join, drift tier
    # KS/PSI/Gini/Benford/stream monitor, bigram NLL, SQ8 quantization,
    # dup-span/passage removal, containment, A/B readout, schema
    # evolution, compaction, winsorize, z-score, cluster reps, lag
    # features, code-bucket dedup, sketch intersection, versioned
    # tables w/ time travel + incremental reads, seeded-IVF full
    # oracle, interval-overlap join) — all locally oracle-verified, no
    # driver row yet. Promote the first 50 of this block into
    # positions 1-50 for r5; the r4 window entries should be
    # driver-green after r4 and rotate down; any overflow leads the
    # r6 window.
    "tx_bloom_decontaminate": (
        q_tx_bloom_decontaminate,
        SQL_TX_BLOOM_DECONTAMINATE,
    ),
    "tx_chunk_windows": (q_tx_chunk_windows, SQL_TX_CHUNK_WINDOWS),
    "d_weighted_sample": (q_d_weighted_sample, SQL_D_WEIGHTED_SAMPLE),
    "w_snapshot_diff": (q_w_snapshot_diff, SQL_W_SNAPSHOT_DIFF),
    "dd_cluster_representatives": (
        q_dd_cluster_representatives,
        SQL_DD_CLUSTER_REPRESENTATIVES,
    ),
    "j_nearest": (q_j_nearest, SQL_J_NEAREST),
    "tx_remove_dup_passages": (
        q_tx_remove_dup_passages,
        SQL_TX_REMOVE_DUP_PASSAGES,
    ),
    "a_winsorize": (q_a_winsorize, SQL_A_WINSORIZE),
    "a_group_zscore": (q_a_group_zscore, SQL_A_GROUP_ZSCORE),
    "w_schema_evolution": (q_w_schema_evolution, SQL_W_SCHEMA_EVOLUTION),
    "w_compact_small_files": (
        q_w_compact_small_files,
        SQL_W_COMPACT_SMALL_FILES,
    ),
    "a_ks_drift": (q_a_ks_drift, SQL_A_KS_DRIFT),
    "a_psi_drift": (q_a_psi_drift, SQL_A_PSI_DRIFT),
    "tx_bigram_nll": (q_tx_bigram_nll, SQL_TX_BIGRAM_NLL),
    "emb_quantize": (q_emb_quantize, SQL_EMB_QUANTIZE),
    "stream_psi_monitor": (q_stream_psi_monitor, SQL_STREAM_PSI_MONITOR),
    "a_benford": (q_a_benford, SQL_A_BENFORD),
    "a_gini": (q_a_gini, SQL_A_GINI),
    "w_scd2": (q_w_scd2, SQL_W_SCD2),
    "ev_ab_metrics": (q_ev_ab_metrics, SQL_EV_AB_METRICS),
    "tx_remove_dup_spans": (
        q_tx_remove_dup_spans,
        SQL_TX_REMOVE_DUP_SPANS,
    ),
    "dd_containment": (q_dd_containment, SQL_DD_CONTAINMENT),
    "f_lag_features": (q_f_lag_features, SQL_F_LAG_FEATURES),
    "emb_code_dedup": (q_emb_code_dedup, SQL_EMB_CODE_DEDUP),
    "a_sketch_intersection": (
        q_a_sketch_intersection,
        SQL_A_SKETCH_INTERSECTION,
    ),
    "w_time_travel": (q_w_time_travel, SQL_W_TIME_TRAVEL),
    "w_incremental_read": (q_w_incremental_read, SQL_W_INCREMENTAL_READ),
    "emb_ivf_topk_seeded": (
        q_emb_ivf_topk_seeded,
        SQL_EMB_IVF_TOPK_SEEDED,
    ),
    # materialized-IVF probe route — definitionally identical output
    # to the inline seeded route, so it shares that oracle (r8)
    "emb_ivf_index_topk": (
        q_emb_ivf_index_topk,
        SQL_EMB_IVF_TOPK_SEEDED,
    ),
    "emb_ivf_sq8_topk": (q_emb_ivf_sq8_topk, SQL_EMB_IVF_SQ8_TOPK),
    "emb_ivf_pq_topk": (q_emb_ivf_pq_topk, SQL_EMB_IVF_PQ_TOPK),
    "emb_ivf_pq_rerank": (q_emb_ivf_pq_rerank, SQL_EMB_IVF_PQ_RERANK),
    "emb_ivf_balance": (q_emb_ivf_balance, SQL_EMB_IVF_BALANCE),
    "emb_rebalance_policy": (
        q_emb_rebalance_policy,
        SQL_EMB_REBALANCE_POLICY,
    ),
    "emb_gate_rung_policy": (
        q_emb_gate_rung_policy,
        SQL_EMB_GATE_RUNG_POLICY,
    ),
    "emb_ivf_cell_stats": (
        q_emb_ivf_cell_stats,
        SQL_EMB_IVF_CELL_STATS,
    ),
    "j_interval_overlap": (q_j_interval_overlap, SQL_J_INTERVAL_OVERLAP),
    "ev_ordered_funnel": (q_ev_ordered_funnel, SQL_EV_ORDERED_FUNNEL),
    "pipeline_curation_v2": (
        q_pipeline_curation_v2,
        SQL_PIPELINE_CURATION_V2,
    ),
    "a_mad_outliers": (q_a_mad_outliers, SQL_A_MAD_OUTLIERS),
    "f_gap_fill": (q_f_gap_fill, SQL_F_GAP_FILL),
    "ev_stickiness": (q_ev_stickiness, SQL_EV_STICKINESS),
    "tx_hapax_ratio": (q_tx_hapax_ratio, SQL_TX_HAPAX_RATIO),
    "ev_props_json": (q_ev_props_json, SQL_EV_PROPS_JSON),
    "tx_ngram_entropy": (q_tx_ngram_entropy, SQL_TX_NGRAM_ENTROPY),
    "f_regex_extract_all": (q_f_regex_extract_all, SQL_F_REGEX_EXTRACT_ALL),
    "a_skew_report": (q_a_skew_report, SQL_A_SKEW_REPORT),
    "ev_transition_latency": (
        q_ev_transition_latency,
        SQL_EV_TRANSITION_LATENCY,
    ),
    "dd_source_overlap": (q_dd_source_overlap, SQL_DD_SOURCE_OVERLAP),
    "stream_sessionize": (q_stream_sessionize, SQL_STREAM_SESSIONIZE),
    "w_zorder_layout": (q_w_zorder_layout, SQL_W_ZORDER_LAYOUT),
    "graph_pagerank": (q_graph_pagerank, SQL_GRAPH_PAGERANK),
    "a_sketch_union": (q_a_sketch_union, SQL_A_SKETCH_UNION),
    "j_fuzzy_match": (q_j_fuzzy_match, SQL_J_FUZZY_MATCH),
    "w_distribution_ranks": (
        q_w_distribution_ranks,
        SQL_W_DISTRIBUTION_RANKS,
    ),
    "tx_dup_family_sizes": (q_tx_dup_family_sizes, SQL_TX_DUP_FAMILY_SIZES),
    "ev_rolling_distinct_users": (
        q_ev_rolling_distinct_users,
        SQL_EV_ROLLING_DISTINCT_USERS,
    ),
    # driver-green in CORRECTNESS_r03
    "dd_exact_text": (q_dd_exact_text, SQL_DD_EXACT),
    "dd_minhash": (q_dd_minhash, SQL_DD_MINHASH),
    "dd_simhash": (q_dd_simhash, SQL_DD_SIMHASH),
    "dd_jaccard": (q_dd_jaccard, SQL_DD_JACCARD),
    "dd_jaccard_ngram": (q_dd_jaccard_ngram, SQL_DD_JACCARD_NGRAM),
    "dd_hamming": (q_dd_hamming, SQL_DD_HAMMING),
    "dd_lsh_candidates": (q_dd_lsh_candidates, SQL_DD_LSH_CANDIDATES),
    "dd_jaccard_lsh": (q_dd_jaccard_lsh, SQL_DD_JACCARD_LSH),
    "dd_clusters": (q_dd_clusters, SQL_DD_CLUSTERS),
    "dd_clusters_lsh": (q_dd_clusters_lsh, SQL_DD_CLUSTERS_LSH),
    "dd_incremental_clusters": (q_dd_incremental_clusters, SQL_DD_CLUSTERS_LSH),
    "k2_phash": (q_k2_phash, SQL_K2_PHASH),
    "u1_column_filter": (q_u1_column_filter, SQL_U1),
    "u2_data_filter": (q_u2_data_filter, SQL_U2),
    "j_asof": (q_j_asof, SQL_J_ASOF),
    "j_asof_nulls": (q_j_asof_nulls, SQL_J_ASOF_NULLS),
    "j_range": (q_j_range, SQL_J_RANGE),
    "j_salted": (q_j_salted, SQL_J_SALTED),
    "emb_topk_cosine": (q_emb_topk, SQL_EMB_TOPK),
    "emb_near_dup": (q_emb_neardup, SQL_EMB_NEARDUP),
    "pipeline_stages": (q_pipeline_stages, SQL_PIPELINE),
    "pipeline_curation": (q_pipeline_curation, SQL_PIPELINE_CURATION),
    "profile_table": (q_profile_table, SQL_PROFILE),
    "a1_quartiles": (q_a1_quartiles, SQL_A1_QUARTILES),
    "a_cube": (q_a_cube, SQL_A_CUBE),
    "a_grouping_sets": (q_a_grouping_sets, SQL_GROUPING_SETS_SHARED),
    "a_median_exact": (q_a_median_exact, SQL_A_MEDIAN),
    "f_explode_wordcount": (q_f_explode_wordcount, SQL_EXPLODE),
    "f_date_extract": (q_f_date_extract, SQL_F_DATE_EXTRACT),
    "f_histogram": (q_f_histogram, SQL_F_HISTOGRAM),
    "w_analytics": (q_w_analytics, SQL_W_ANALYTICS),
    "sql_surface_q10": (q_sql_surface, SQL_Q10_SHARED),
    "h1_pricing_summary": (q_h1_pricing_summary, SQL_H1),
    "h3_top_orders": (q_h3_top_orders, SQL_H3),
    "h5_region_revenue": (q_h5_region_revenue, SQL_H5),
    "h6_forecast_revenue": (q_h6_forecast_revenue, SQL_H6),
    "h7_nation_volume": (q_h7_nation_volume, SQL_H7),
    "h8_market_share": (q_h8_market_share, SQL_H8),
    "h13_count_distribution": (q_h13_count_distribution, SQL_H13),
    "h14_promo_revenue": (q_h14_promo_revenue, SQL_H14),
    "h15_top_supplier": (q_h15_top_supplier, SQL_H15),
    "h17_small_quantity": (q_h17_small_quantity, SQL_H17),
    "h2_min_cost_supplier": (q_h2_min_cost_supplier, SQL_H2),
    "h9_product_profit": (q_h9_product_profit, SQL_H9),
    "h11_important_stock": (q_h11_important_stock, SQL_H11),
    "h16_supplier_relationship": (q_h16_supplier_relationship, SQL_H16),
    "h20_promotion_suppliers": (q_h20_promotion_suppliers, SQL_H20),
    "h18_large_orders": (q_h18_large_orders, SQL_H18),
    "h19_disjunctive": (q_h19_disjunctive, SQL_H19),
    "h22_idle_customers": (q_h22_idle_customers, SQL_H22),
    "stream_sliding_window": (q_stream_sliding, SQL_STREAM_SLIDING),
    "stream_session_window": (q_stream_session, SQL_STREAM_SESSION),
    "stream_dedup": (q_stream_dedup, SQL_STREAM_DEDUP),
    "tx_repetition": (q_tx_repetition, SQL_TX_REPETITION),
    "tx_pii_scrub": (q_tx_pii_scrub, SQL_TX_PII_SCRUB),
    "tx_decontaminate": (q_tx_decontaminate, SQL_TX_DECONTAMINATE),
    # driver-green in CORRECTNESS_r01 and r02
    "s1_files_scan": (q_s1_files_scan, SQL_S1),
    "s2_provenance": (q_s2_provenance, SQL_S2),
    "s4_inmemory": (q_s4_inmemory, SQL_S4),
    "p1_filter": (q_p1_filter, SQL_P1),
    "p2_df_filter": (q_p2_df_filter, SQL_P2),
    "p3_projection": (q_p3_projection, SQL_P3),
    "p4_column_expr": (q_p4_column_expr, SQL_P4),
    "p6_notnull": (q_p6_notnull, SQL_P6),
    "j1_filter_merge": (q_j1_filter_merge, SQL_J1),
    "j3_inner_join": (q_j3_inner, SQL_J3),
    "j_semi": (q_j_semi, SQL_J_SEMI),
    "j_anti": (q_j_anti, SQL_J_ANTI),
    "a1_summary_stats": (q_a1_summary, SQL_A1),
    "a3_group_agg": (q_a3_group_agg, SQL_A3),
    "a4_count_distinct": (q_a4_count_distinct, SQL_A4),
    "a5_dup_detect": (q_a5_dup_detect, SQL_A5),
    "a_rollup": (q_a_rollup, SQL_A_ROLLUP),
    "d1_distinct": (q_d1_distinct, SQL_D1),
    "d1_keep_first": (q_d1_keep_first, SQL_D1_KEEP_FIRST),
    "d2_shuffle": (q_d2_shuffle, SQL_D2),
    "d3_sample": (q_d3_sample, SQL_D3_SAMPLE),
    "d4_union": (q_d4_union, SQL_D4),
    "d5_topk": (q_d5_topk, SQL_D5),
    "d7_limit_offset": (q_d7_limit_offset, SQL_D7),
    "set_intersect": (q_set_intersect, SQL_INTERSECT),
    "set_except": (q_set_except, SQL_EXCEPT),
    "set_except_nonempty": (q_set_except_nonempty, SQL_EXCEPT_NONEMPTY),
    "w_window_topn": (q_window_topn, SQL_WINDOW_TOPN),
    "w_window_running": (q_window_running, SQL_WINDOW_RUNNING),
    "f1_basename": (q_f1_basename, SQL_F1),
    "f2_substring": (q_f2_substring, SQL_F2),
    "f3_concat": (q_f3_concat, SQL_F3),
    "f4_suffix": (q_f4_suffix, SQL_F4),
    "f5_regex_clean": (q_f5_regex_clean, SQL_F5),
    "f6_lower_trim": (q_f6_lower_trim, SQL_F6),
    "f7_arith": (q_f7_arith, SQL_F7),
    "f8_json": (q_f8_json, SQL_F8),
    "f9_least_greatest": (q_f9_least_greatest, SQL_F9),
    "f_date_trunc": (q_f_date_trunc, SQL_F_DATE),
    "f_time_bucket": (q_f_time_bucket, SQL_F_TIME_BUCKET),
    "stream_tumbling_window": (q_stream_tumbling, SQL_STREAM_TUMBLING),
    "v2_key_unique": (q_v2_key_unique, SQL_V2),
    "v3_referential": (q_v3_referential, SQL_V3),
    "w1_roundtrip_shards": (q_w1_roundtrip, SQL_W1),
    "w_shards_native_roundtrip": (
        q_w_shards_native_roundtrip,
        SQL_W_SHARDS_NATIVE,
    ),
    "w_shards_meta_jvm": (
        q_w_shards_meta_jvm,
        SQL_W_SHARDS_META_JVM,
    ),
    "w_shards_objectstore_roundtrip": (
        q_w_shards_objectstore_roundtrip,
        SQL_W_SHARDS_OBJECTSTORE,
    ),
    "w_shardedfiles_native_roundtrip": (
        q_w_shardedfiles_native_roundtrip,
        SQL_W_SHARDEDFILES_NATIVE,
    ),
    "w_update_metadata_native": (
        q_w_update_metadata_native,
        SQL_W_UPDATE_METADATA,
    ),
    "w_shards_parquet_meta_roundtrip": (
        q_w_shards_parquet_meta_roundtrip,
        SQL_W_SHARDS_PARQUET_META,
    ),
    "w_shard_stats": (q_w_shard_stats, SQL_W_SHARD_STATS),
    "stream_shards_sink": (q_stream_shards_sink, SQL_STREAM_SHARDS_SINK),
    "w_shards_compact": (q_w_shards_compact, SQL_W_SHARDS_COMPACT),
    "w4_update_columns": (q_w4_update_columns, SQL_W4),
    "w5_rename_columns": (q_w5_rename, SQL_W5),
    "w6_delete_columns": (q_w6_delete, SQL_W6),
    "tx_token_stats": (q_tx_token_stats, SQL_TX_TOKENS),
    "tx_quality": (q_tx_quality, SQL_TX_QUALITY),
    "tx_langid": (q_tx_langid, SQL_TX_LANGID),
    "tx_fingerprint": (q_tx_fingerprint, SQL_TX_FINGERPRINT),
    # -- round-5 additions --------------------------------------------
    # ev_dominant_users completes the 50-entry r5 window (below);
    # further r5 additions sit BELOW the fold so they do not displace
    # the 49 round-4 entries awaiting their driver check — they are
    # r6-window candidates, judge-checkable locally meanwhile.
    "ev_dominant_users": (q_ev_dominant_users, SQL_EV_DOMINANT_USERS),
    "tx_quality_classifier": (
        q_tx_quality_classifier,
        SQL_TX_QUALITY_CLASSIFIER,
    ),
    "dd_minhash_calibration": (
        q_dd_minhash_calibration,
        SQL_DD_MINHASH_CALIBRATION,
    ),
    "dd_semantic_vs_lexical": (
        q_dd_semantic_vs_lexical,
        SQL_DD_SEMANTIC_VS_LEXICAL,
    ),
    "stream_quality_gate": (
        q_stream_quality_gate,
        SQL_STREAM_QUALITY_GATE,
    ),
    "ev_engagement_profile": (
        q_ev_engagement_profile,
        SQL_EV_ENGAGEMENT_PROFILE,
    ),
    "stream_near_dup_ingest": (
        q_stream_near_dup_ingest,
        _near_dup_ingest_sql(),
    ),
    # embedding twin of the near-dup gate (r8): IVF-cell-blocked
    # cosine gate inside a checkpointed foreachBatch stream
    "stream_semantic_ingest": (
        q_stream_semantic_ingest,
        SQL_STREAM_SEMANTIC_INGEST,
    ),
    # greedy farthest-point coreset selection (r8): deterministic
    # seed + portable arithmetic -> the full greedy trajectory is
    # FULL-oracled via unrolled per-round CTEs
    "emb_kcenter": (q_emb_kcenter, _kcenter_sql(5)),
    "emb_kcenter_batched": (q_emb_kcenter_batched, _kcenter_sql(8)),
    "emb_centroid_prune": (q_emb_centroid_prune, SQL_EMB_CENTROID_PRUNE),
}

# r7 WINDOW (rotation per VERDICT r6 item 2): the driver checks the
# FIRST 50 entries per round — EXACTLY 50 here (the r6 window listed
# 52, silently dropping f8_json/f9_least_greatest off the end; both
# lead this round's stale cohort instead). Positions 1-5 are the
# queries changed or added in r7: emb_ann_recall (column renamed
# mlsh_beats_lsh -> mlsh_ge_lsh, pin relaxed to the superset-implied
# >=), the three LSH ANN paths that gained zero-norm filters, and the
# new non-empty EXCEPT ALL variant. Positions 6-21 are the ENTIRE
# 16-query cohort last driver-checked in round 2 (incl. d3_sample,
# rows-only by design). Positions 22-50 are 29 of the 50 queries last
# checked in round 3, prioritizing ones with no independent local
# re-verification in the r6 judge session; the remaining 21
# r3-checked queries are re-verified locally this round via
# tools/check_correctness.py (outcomes in COVERAGE.md — rotation
# history table there too).
_R7_WINDOW = [
    "emb_ann_recall", "emb_lsh_topk", "emb_lsh_multi_topk",
    "emb_lsh_index_topk", "set_except_nonempty",
    "w4_update_columns", "w5_rename_columns", "w6_delete_columns",
    "stream_tumbling_window", "v2_key_unique", "v3_referential",
    "w1_roundtrip_shards", "f8_json", "f9_least_greatest",
    "f_date_trunc", "f_time_bucket", "tx_token_stats",
    "tx_fingerprint", "tx_langid", "tx_quality", "d3_sample",
    "a1_quartiles", "a_cube", "a_grouping_sets", "dd_clusters",
    "dd_clusters_lsh", "dd_jaccard_lsh", "dd_jaccard_ngram",
    "emb_near_dup", "f_date_extract", "f_explode_wordcount",
    "f_histogram", "h1_pricing_summary", "h3_top_orders",
    "h5_region_revenue", "h6_forecast_revenue", "h7_nation_volume",
    "h13_count_distribution", "h14_promo_revenue", "h15_top_supplier",
    "h18_large_orders", "h19_disjunctive", "h22_idle_customers",
    "j_asof_nulls", "j_range", "pipeline_curation", "pipeline_stages",
    "profile_table", "stream_sliding_window", "tx_pii_scrub",
]

# r10 WINDOW (r9 was cut short before the driver check ran, so this
# window rotates off the r8 state): positions 1-4 are the NEW
# queries — emb_gate_recall (FULL-oracled false-negative audit of
# the semantic dedup gate at n_probe 1/2/4; VERDICT r8 item 3),
# emb_gate_blas_parity (driver coverage for the blas production
# path incl. the r9 max_cell_rows salting; VERDICT r8 item 5), and
# emb_ivf_sq8_topk (NEW: SQ8-compressed IVF index probe, FULL
# oracle over the packed-code arithmetic), and emb_ivf_pq_topk
# (NEW: IVF-PQ index probe — seeded codebooks, FULL oracle).
# Positions 5-27 are the ENTIRE 23-query cohort last driver-checked
# in r4 (all re-verified locally by the r8 judge, 22 pass + 1
# rows-only-by-design). Positions 28-50 are the oldest 23 of the
# 50-query r5-stale cohort in registry order (emb_code_dedup and
# a_sketch_intersection, next in that order, lead the r11
# rotation). Post-r10 staleness: nothing older than r5. Rotation
# history in COVERAGE.md. ALL 50 verified locally this round via
# tools/check_correctness.py at sf0.01 (PLANS.md "r10 local
# full-registry verification").
_R10_WINDOW = [
    "emb_gate_recall", "emb_gate_blas_parity", "emb_ivf_sq8_topk",
    "emb_ivf_pq_topk",
    # the ENTIRE r4-stale cohort (23)
    "a_mode_per_group", "a_top_docs_per_source", "d_split_assign",
    "emb_ivf_topk", "emb_kmeans", "ev_anomaly_days",
    "ev_attribution", "ev_quartiles_by_type", "ev_retention",
    "ev_sessionize", "ev_top_paths", "f_ngram_profile",
    "j_full_outer", "stream_enriched_agg", "tx_dup_passages",
    "tx_filter_funnel", "tx_keyword_search", "tx_lang_mix",
    "tx_nll_buckets", "tx_pack_sequences", "w_bucketed_join",
    "w_merge_upsert", "w_rolling_revenue",
    # oldest 23 of the r5-stale cohort (registry order)
    "tx_bloom_decontaminate", "tx_chunk_windows", "d_weighted_sample",
    "w_snapshot_diff", "dd_cluster_representatives", "j_nearest",
    "tx_remove_dup_passages", "a_winsorize", "a_group_zscore",
    "w_schema_evolution", "w_compact_small_files", "a_ks_drift",
    "a_psi_drift", "tx_bigram_nll", "emb_quantize",
    "stream_psi_monitor", "a_benford", "a_gini", "w_scd2",
    "ev_ab_metrics", "tx_remove_dup_spans", "dd_containment",
    "f_lag_features",
]
assert len(_R10_WINDOW) == 50, len(_R10_WINDOW)

# r11 WINDOW: positions 1-6 are the never-driver-checked queries —
# emb_ivf_pq_rerank (the production-recommended two-stage PQ serving
# path, added after the r10 window froze), emb_kcenter_batched
# (NEW r11: pooled-batch k-center with pool covering the corpus =
# exact greedy trajectory, FULL oracle), emb_ivf_cell_stats
# (NEW r11: one-row IVF cell-balance report on the seeded
# quantizer, FULL oracle), emb_gate_sq8 (NEW r11: two-stage
# SQ8-compressed semantic gate with the sound derived margin —
# provably equal to the exact gate, FULL oracle), emb_gate_pq
# (NEW r11: the PQ twin — per-row 2·resid/vnorm margins from the
# stored reconstruction residuals, FULL oracle), and
# emb_gate_margin_report (NEW r11: one-row sizing report for the
# compressed gate — Δ, min/mean vnorm, derived margin, stage-1
# headroom; FULL oracle). Positions 7-33 are the ENTIRE 27-query
# r5-stale cohort in registry order (all re-verified locally by the
# r10 judge, 27/27 green — confirmation, not risk). Positions 34-50
# are the oldest 17 of the 47-query r6 cohort in registry order
# (dd_incremental_clusters .. j_semi; the remaining 30 r6 queries,
# j_anti first, lead the r12 rotation). Post-r11 staleness: nothing
# never-checked, nothing older than r6. Rotation history in
# COVERAGE.md.
_R11_WINDOW = [
    "emb_ivf_pq_rerank", "emb_kcenter_batched", "emb_ivf_cell_stats",
    "emb_gate_sq8", "emb_gate_pq", "emb_gate_margin_report",
    "emb_code_dedup",
    "a_sketch_intersection", "w_time_travel", "w_incremental_read",
    "emb_ivf_topk_seeded", "j_interval_overlap", "ev_ordered_funnel",
    "pipeline_curation_v2", "a_mad_outliers", "f_gap_fill",
    "ev_stickiness", "tx_hapax_ratio", "ev_props_json",
    "tx_ngram_entropy", "f_regex_extract_all", "a_skew_report",
    "ev_transition_latency", "dd_source_overlap", "stream_sessionize",
    "w_zorder_layout", "graph_pagerank", "a_sketch_union",
    "j_fuzzy_match", "w_distribution_ranks", "tx_dup_family_sizes",
    "ev_rolling_distinct_users", "ev_dominant_users",
    "dd_incremental_clusters",
    "h2_min_cost_supplier", "h9_product_profit", "h11_important_stock",
    "h16_supplier_relationship", "h20_promotion_suppliers",
    "s1_files_scan",
    "s2_provenance", "s4_inmemory", "p1_filter",
    "p2_df_filter", "p3_projection", "p4_column_expr",
    "p6_notnull", "j1_filter_merge", "j3_inner_join",
    "j_semi",
]
assert len(_R11_WINDOW) == 50, len(_R11_WINDOW)

# r12 driver window: positions 1-4 are the round's new/changed
# queries (emb_ivf_balance — NEW r12: hot-cell quantizer splitting,
# FULL oracle over the seed/reassign arithmetic;
# emb_gate_pq_margin_report — NEW r12: one-row FULL-oracled sizing
# report for the PQ gate's per-row margins, the 16 B rung's
# go/no-go instrument; emb_gate_sq8 — oracle CHANGED r12: degenerate
# dn<=0 corpus rows now modeled as unconditional candidates, ADVICE
# r11; emb_gate_sq8_stats — NEW r12: the gate_stats runtime
# telemetry itself FULL-oracled, the jvm stage-1 shortlist size is
# bit-portable). Positions 5-34 are the ENTIRE 30-query r6-stale
# cohort in registry order (the oldest driver checks remaining; all
# 30 re-verified green locally by the r11 judge — confirmation, not
# risk). Positions 35-50 are the oldest 16 of the 49-query r7 cohort
# in registry order (emb_ann_recall .. a_grouping_sets).
# Post-r12 staleness: nothing never-checked, nothing older than r7.
# Rotation history in COVERAGE.md.
_R12_WINDOW = [
    "emb_ivf_balance", "emb_gate_pq_margin_report", "emb_gate_sq8",
    "emb_gate_sq8_stats",
    "j_anti", "a1_summary_stats", "a3_group_agg", "a4_count_distinct",
    "a5_dup_detect", "a_rollup", "d1_distinct", "d1_keep_first",
    "d2_shuffle", "d4_union", "d5_topk", "d7_limit_offset",
    "set_intersect", "set_except", "w_window_topn", "w_window_running",
    "f1_basename", "f2_substring", "f3_concat", "f4_suffix",
    "f5_regex_clean", "f6_lower_trim", "f7_arith",
    "tx_quality_classifier", "dd_minhash_calibration",
    "dd_semantic_vs_lexical", "stream_quality_gate",
    "ev_engagement_profile", "stream_near_dup_ingest",
    "emb_centroid_prune",
    "emb_ann_recall", "emb_lsh_topk", "emb_lsh_multi_topk",
    "dd_jaccard_ngram", "dd_jaccard_lsh", "dd_clusters",
    "dd_clusters_lsh", "j_asof_nulls", "j_range", "emb_near_dup",
    "pipeline_stages", "pipeline_curation", "profile_table",
    "a1_quartiles", "a_cube", "a_grouping_sets",
]
assert len(_R12_WINDOW) == 50, len(_R12_WINDOW)

# r13 driver window (rotation per VERDICT r12 item 1): positions 1-4
# are this round's new/changed queries (emb_rebalance_policy — NEW
# r13: the auto-rebalance trigger's deterministic decision arithmetic
# FULL-oracled, VERDICT r12 item 4; d3_sample — oracle NEW r13: was
# the last perpetual no-oracle row, now a partial verdict-boolean
# oracle (subset anti-join + seeded-binomial count bounds + seed
# determinism), VERDICT r12 item 2; emb_ivf_topk — oracle NEW r13:
# recall@k-vs-exact >= threshold boolean, VERDICT r12 item 2;
# stream_semantic_ingest — code path CHANGED r13: curation.py now
# hosts the opt-in auto-rebalance policy, off by default but the
# ingest loop was re-plumbed, so re-verify under the driver).
# w_shards_native_roundtrip — NEW r13: the DSv2 shards WRITE path
# (commit-protocol writer) round-tripped through the DSv2 reader,
# FULL oracle incl. the shard-rolling arithmetic;
# stream_shards_sink — NEW r13: the STREAMING shard sink, oracle pins
# the exactly-once rerun (n_after_rerun == n_first == count);
# w_shards_compact — NEW r13: two-phase manifest-committed shard
# compaction, oracle pins the whole retire/rewrite arithmetic;
# emb_gate_prefix — NEW r13: the training-free PREFIX rung of the
# gate compression ladder (per-pair Cauchy-Schwarz bound, sound at
# margin=0), FULL kept-set oracle; emb_gate_prefix_report — NEW r13:
# its one-row rest-mass sizing report + gate telemetry, FULL oracle.
# Positions 10-41 are the ENTIRE remaining 32-query r7-stale cohort
# in registry order (d3_sample, the 33rd, already leads) — after
# r13 nothing in the registry is staler than r8. Positions 42-50
# are the oldest 9 of the 50-query r8 cohort in registry order
# (d_hash_sample .. emb_label_centroids; stream_semantic_ingest,
# also r8, is in position 4). Rotation history in COVERAGE.md.
_R13_WINDOW = [
    "emb_rebalance_policy", "d3_sample", "emb_ivf_topk",
    "stream_semantic_ingest", "w_shards_native_roundtrip",
    "stream_shards_sink", "w_shards_compact", "emb_gate_prefix",
    "emb_gate_prefix_report",
    "f_explode_wordcount", "f_date_extract", "f_histogram",
    "h1_pricing_summary", "h3_top_orders", "h5_region_revenue",
    "h6_forecast_revenue", "h7_nation_volume", "h13_count_distribution",
    "h14_promo_revenue", "h15_top_supplier", "h18_large_orders",
    "h19_disjunctive", "h22_idle_customers", "stream_sliding_window",
    "tx_pii_scrub", "set_except_nonempty", "f8_json",
    "f9_least_greatest", "f_date_trunc", "f_time_bucket",
    "stream_tumbling_window", "v2_key_unique", "v3_referential",
    "w1_roundtrip_shards", "w4_update_columns", "w5_rename_columns",
    "w6_delete_columns", "tx_token_stats", "tx_quality", "tx_langid",
    "tx_fingerprint",
    "d_hash_sample", "w_jsonl_roundtrip", "h4_priority_exists",
    "h10_returned_items", "h12_priority_by_status",
    "h21_waiting_suppliers", "tx_tfidf", "tx_zipf",
    "emb_label_centroids",
]
assert len(_R13_WINDOW) == 50, len(_R13_WINDOW)

# r14 driver window (rotation per VERDICT r13 item 1): positions 1-3
# are this round's NEW queries (w_shards_objectstore_roundtrip — the
# dpf_shards lifecycle over the fakeobj:// object-store backend,
# FULL oracle incl. a split_name-pruned leg, VERDICT r13 item 2;
# w_shardedfiles_native_roundtrip — the sharded-files layout
# (N.csv + loose-file folder) through the DSv2 commit protocol with
# the member bytes decoded back to text, FULL oracle, VERDICT r13
# item 3; emb_gate_rung_policy — the gate-rung auto-picker's decision
# arithmetic on raw + matryoshka-transformed corpora, FULL oracle,
# VERDICT r13 item 4/5). Positions 4-10 are CHANGED-code re-verifies:
# w_shards_native_roundtrip / stream_shards_sink / w_shards_compact
# (shards_source rewired through the shard_fs seam + the four ADVICE
# r13 fixes + the write-path shave), w1_roundtrip_shards and
# s2_provenance (the _shards_v2 schema-inference pass now parses the
# RFC4180 dialect with multiLine + doublequote escape),
# stream_semantic_ingest and emb_rebalance_policy (the ingest loop
# re-plumbed for the auto_rung rung state; w_update_metadata_native —
# NEW late-r14: the commit-protocol W4 write-back, FULL oracle;
# w_shards_parquet_meta_roundtrip — NEW late-r14: parquet metadata
# shards (the reference's configurable datafiles_ext) through the
# DSv2 lifecycle incl. nested metadata, FULL oracle).
# w_shard_stats (NEW latest-r14: the per-shard census, FULL oracle)
# stays BELOW the fold — the window is full; it was verified locally
# at sf0.01 AND sf0.1 this round and leads the r15 new cohort.
# Positions 11-50 are the
# ENTIRE remaining 40-query r8-stale cohort in registry order
# (stream_interval_join .. emb_kcenter) — after r14 nothing in the
# registry is staler than r10. Rotation history in COVERAGE.md.
_R14_WINDOW = [
    "w_shards_objectstore_roundtrip", "w_shardedfiles_native_roundtrip",
    "emb_gate_rung_policy", "w_update_metadata_native",
    "w_shards_parquet_meta_roundtrip",
    "w_shards_native_roundtrip", "stream_shards_sink", "w_shards_compact",
    # (w1_roundtrip_shards, r13-checked, yields its slot to the new
    # parquet-meta query; its changed inference path is covered under
    # the driver by s2_provenance)
    "s2_provenance", "stream_semantic_ingest",
    # (emb_rebalance_policy, r13-checked, yields its slot to the new
    # w_update_metadata_native; its changed lines — rung-state
    # plumbing in the rebalance rebuild — are exercised under the
    # driver by stream_semantic_ingest and locally by the
    # auto-rung x rebalance interaction test)
    # the ENTIRE remaining r8-stale cohort (40, registry order)
    "stream_interval_join", "w_convert_formats", "a_approx_sketches",
    "ev_funnel", "a_pivot", "f_unpivot", "stream_curation",
    "d_temperature_sample", "d_per_group_sample",
    "dd_incremental_near_dup", "tx_unigram_nll", "a_corr_matrix",
    "w_hive_partitioned", "tx_budget_mix", "d_stratified_sample",
    "dd_incremental", "emb_lsh_index_topk", "emb_ivf_index_topk",
    "dd_exact_text", "dd_minhash", "dd_simhash", "dd_jaccard",
    "dd_hamming", "dd_lsh_candidates", "k2_phash", "u1_column_filter",
    "u2_data_filter", "j_asof", "j_salted", "emb_topk_cosine",
    "a_median_exact", "w_analytics", "sql_surface_q10",
    "h8_market_share", "h17_small_quantity", "stream_session_window",
    "stream_dedup", "tx_repetition", "tx_decontaminate", "emb_kcenter",
]
assert len(_R14_WINDOW) == 50, len(_R14_WINDOW)

# r15 driver window (rotation per VERDICT r14 item 1): position 1 is
# w_shard_stats — the per-shard census over the DSv2 metadata
# (FULL oracle), added after the r14 window froze and therefore the
# only registry query never driver-checked (verified locally at
# sf0.01 AND sf0.1 in r14). Positions 2-50 are the ENTIRE 49-query
# r10-stale cohort in r10-window order (keys(CORRECTNESS_r10) minus
# every later CORRECTNESS file; emb_ivf_topk, also r10-checked, was
# re-verified in r13 and is excluded). After r15 nothing in the
# registry is staler than r11 and nothing is never-checked.
# Rotation history in COVERAGE.md.
_R15_WINDOW = [
    "w_shard_stats",
    # the ENTIRE r10-stale cohort (49, r10-window order)
    "emb_gate_recall", "emb_gate_blas_parity", "emb_ivf_sq8_topk",
    "emb_ivf_pq_topk", "a_mode_per_group", "a_top_docs_per_source",
    "d_split_assign", "emb_kmeans", "ev_anomaly_days",
    "ev_attribution", "ev_quartiles_by_type", "ev_retention",
    "ev_sessionize", "ev_top_paths", "f_ngram_profile",
    "j_full_outer", "stream_enriched_agg", "tx_dup_passages",
    "tx_filter_funnel", "tx_keyword_search", "tx_lang_mix",
    "tx_nll_buckets", "tx_pack_sequences", "w_bucketed_join",
    "w_merge_upsert", "w_rolling_revenue", "tx_bloom_decontaminate",
    "tx_chunk_windows", "d_weighted_sample", "w_snapshot_diff",
    "dd_cluster_representatives", "j_nearest",
    "tx_remove_dup_passages", "a_winsorize", "a_group_zscore",
    "w_schema_evolution", "w_compact_small_files", "a_ks_drift",
    "a_psi_drift", "tx_bigram_nll", "emb_quantize",
    "stream_psi_monitor", "a_benford", "a_gini", "w_scd2",
    "ev_ab_metrics", "tx_remove_dup_spans", "dd_containment",
    "f_lag_features",
]
assert len(_R15_WINDOW) == 50, len(_R15_WINDOW)

# r16 driver window (rotation per VERDICT r15 item 1): positions 1-2
# are the round's new/changed slots — w_shards_meta_jvm (NEW: the
# JVM-native metadata fast path, engine="jvm", published-schema
# pinned scan) and w1_roundtrip_shards (CHANGED: legacy non-append
# writes now purge the previous generation before the authoritative
# schema publish, and its read_metadata_shards default engine="auto"
# now takes the JVM route on published local datasets). Positions
# 3-50 are the ENTIRE 48-query r11-stale cohort in r11-window order
# (keys(CORRECTNESS_r11) minus every later CORRECTNESS file). After
# r16 nothing in the registry is staler than r12. Rotation history in
# COVERAGE.md.
_R16_WINDOW = [
    "w_shards_meta_jvm", "w1_roundtrip_shards",
    # the ENTIRE r11-stale cohort (48, r11-window order)
    "emb_ivf_pq_rerank", "emb_kcenter_batched", "emb_ivf_cell_stats",
    "emb_gate_pq", "emb_gate_margin_report", "emb_code_dedup",
    "a_sketch_intersection", "w_time_travel", "w_incremental_read",
    "emb_ivf_topk_seeded", "j_interval_overlap", "ev_ordered_funnel",
    "pipeline_curation_v2", "a_mad_outliers", "f_gap_fill",
    "ev_stickiness", "tx_hapax_ratio", "ev_props_json",
    "tx_ngram_entropy", "f_regex_extract_all", "a_skew_report",
    "ev_transition_latency", "dd_source_overlap", "stream_sessionize",
    "w_zorder_layout", "graph_pagerank", "a_sketch_union",
    "j_fuzzy_match", "w_distribution_ranks", "tx_dup_family_sizes",
    "ev_rolling_distinct_users", "ev_dominant_users",
    "dd_incremental_clusters", "h2_min_cost_supplier",
    "h9_product_profit", "h11_important_stock",
    "h16_supplier_relationship", "h20_promotion_suppliers",
    "s1_files_scan", "s4_inmemory", "p1_filter", "p2_df_filter",
    "p3_projection", "p4_column_expr", "p6_notnull", "j1_filter_merge",
    "j3_inner_join", "j_semi",
]
assert len(_R16_WINDOW) == 50, len(_R16_WINDOW)
REGISTRY = {
    **{k: REGISTRY[k] for k in _R16_WINDOW},
    **{k: v for k, v in REGISTRY.items() if k not in _R16_WINDOW},
}


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
