"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for operators Spark's built-in windowed/dedup state
can't express (SURVEY.md §2.B UDF surface): arbitrary per-key state
carried across micro-batches, Arrow-batched to Python. Demonstrated
with a running per-user accumulator; the same shape serves custom
sessionizers, CDC upserts, online feature aggregation, etc.

Scale notes: state lives in the state store partitioned by the grouping
key — per-key state must stay small and bounded (here: two scalars per
user). The Arrow transfer batches the whole key-group per micro-batch,
so hot keys are the skew risk, exactly as in a shuffle.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
STATE_SCHEMA = "n BIGINT, tot DOUBLE"


def _update_user_totals(
    key: tuple[Any, ...],
    pdf_iter: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, tot = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        tot += float(pdf["value"].sum())
    state.update((n, tot))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [tot]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user event count + value sum, one update per batch.

    Streaming: emits the refreshed running total for every user seen in
    each micro-batch (output mode ``update``). Batch equivalence: the
    last update per user equals ``groupBy(user_id).agg(count, sum)``
    over the whole table.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API): the successor
# to applyInPandasWithState — typed state handles, timers, RocksDB-backed
# ---------------------------------------------------------------------------
TWS_OUT_SCHEMA = "event_type STRING, n_events BIGINT, total_value DOUBLE"


def _make_type_totals_processor():
    """Factory (deferred import: the StatefulProcessor base only matters
    on streaming queries, and older runtimes may lack it)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TypeTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n BIGINT, tot DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, tot = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                tot += float(pdf["value"].sum())
            self._state.update((n, tot))
            yield pd.DataFrame(
                {"event_type": [key[0]], "n_events": [n], "total_value": [tot]}
            )

        def close(self) -> None:
            pass

    return TypeTotals()


def running_type_totals_tws(events: DataFrame) -> DataFrame:
    """Cumulative per-event-type totals via ``transformWithStateInPandas``.

    Same semantics as :func:`running_user_totals` but on the Spark 4
    arbitrary-state API: typed state handles (ValueState/ListState/
    MapState), optional timers, and a RocksDB state store — the API new
    stateful operators should target. Requires
    ``spark.sql.streaming.stateStore.providerClass`` =
    ``RocksDBStateStoreProvider`` (set by the caller/test; a batch plan
    ignores it) and ``google.protobuf`` at runtime (the state-server
    protocol) — the test suite skips when protobuf is absent.
    """
    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=_make_type_totals_processor(),
        outputStructType=TWS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
