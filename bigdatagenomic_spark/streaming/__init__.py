"""Structured Streaming surface (SURVEY.md §2.B S01-S06).

The reference is strictly batch (one MPI program run end-to-end,
assembly_final.cpp:648-748); this package is north-star surface. The
design idiom is *unified* transformations: every op takes an ``events``
DataFrame that may be batch or streaming and returns the transformed
DataFrame, so the exact same plan is (a) oracle-checked in batch mode
against DuckDB and (b) batch-equivalence-checked in streaming mode
(SURVEY.md §5.2 item 5).
"""

from bigdatagenomic_spark.streaming.ops import (
    dedup_events,
    enrich_with_nation,
    q_s02_window_agg,
    q_s03_session_agg,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from bigdatagenomic_spark.streaming.replay import (
    read_event_stream,
    run_to_memory,
    write_event_chunks,
)
from bigdatagenomic_spark.streaming.stateful import (
    running_type_totals_tws,
    running_user_totals,
)

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "dedup_events",
    "enrich_with_nation",
    "q_s02_window_agg",
    "q_s03_session_agg",
    "write_event_chunks",
    "read_event_stream",
    "run_to_memory",
    "running_type_totals_tws",
    "running_user_totals",
]
