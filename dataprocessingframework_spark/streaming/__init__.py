from dataprocessingframework_spark.streaming.events import (
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    stream_static_enrich,
    stream_stream_interval_join,
    tumbling_window_agg,
    windowed_psi,
)
from dataprocessingframework_spark.streaming.curation import (
    incremental_curation,
    incremental_near_dup_ingest,
    incremental_semantic_ingest,
    read_corpus,
)
from dataprocessingframework_spark.streaming.ingest import incremental_ingest
from dataprocessingframework_spark.streaming.stateful import (
    running_user_totals,
    stateful_sessionize,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stream_dedup",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "windowed_psi",
    "incremental_ingest",
    "incremental_curation",
    "incremental_near_dup_ingest",
    "incremental_semantic_ingest",
    "read_corpus",
    "running_user_totals",
    "stateful_sessionize",
]
