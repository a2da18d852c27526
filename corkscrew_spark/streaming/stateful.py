"""Custom stateful streaming: per-resource state-transition detection.

The reference's change tracker decides CREATE vs UPDATE by comparing each
incoming resource state to the last state it has seen for that id
(aws_change_tracker.go:443-551 derives ChangeEvents from AWS Config
history; the informer cache does the same for K8s Add/Update events,
informer_cache.go:78-134). In Spark that "last seen state" is keyed
streaming state: ``applyInPandasWithState`` keeps one small record per
resource id, Arrow-batched per group, checkpointed with the query — so
the detector survives restarts and scales by hash-partitioning the ids
across executors.

State per key is O(1) (last checksum + count), so total state is bounded
by the live-resource cardinality, not the stream length; an optional
processing-time timeout evicts ids not seen for a while (deleted
resources) and emits a DELETE transition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSITION_SCHEMA = StructType(
    [
        StructField("resource_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("change_type", StringType()),
        StructField("prev_checksum", StringType()),
        StructField("checksum", StringType()),
        StructField("n_seen", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_checksum", StringType()),
        StructField("n_seen", LongType()),
    ]
)


def _make_detect(timeout_ms: int | None):
    def _detect(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        resource_id = key[0]
        if state.hasTimedOut:
            last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "resource_id": [resource_id],
                    "ts": [pd.Timestamp.now()],
                    "change_type": ["DELETE"],
                    "prev_checksum": [last],
                    "checksum": [None],
                    "n_seen": [n],
                }
            )
            return

        last, n = state.get if state.exists else (None, 0)
        out: dict[str, list[Any]] = {c.name: [] for c in TRANSITION_SCHEMA.fields}
        for pdf in pdfs:
            for row in pdf.sort_values("ts").itertuples(index=False):
                n += 1
                if last is None:
                    change = "CREATE"
                elif row.checksum != last:
                    change = "UPDATE"
                else:
                    continue  # unchanged snapshot — no event
                out["resource_id"].append(resource_id)
                out["ts"].append(row.ts)
                out["change_type"].append(change)
                out["prev_checksum"].append(last)
                out["checksum"].append(row.checksum)
                out["n_seen"].append(n)
                last = row.checksum
        state.update((last, n))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        if out["resource_id"]:
            yield pd.DataFrame(out)

    return _detect


def detect_state_transitions(
    snapshots: DataFrame,
    timeout_ms: int | None = None,
) -> DataFrame:
    """CREATE/UPDATE (and timeout-driven DELETE) events from a stream of
    (resource_id, ts, checksum) state snapshots.

    ``snapshots`` may be the raw resource feed with a checksum column
    precomputed by ``F.sha2(to_json(struct(...)), 256)`` — the F7
    checksum — so "did anything change" is a string compare, never a
    field-by-field diff in Python.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        snapshots.groupBy("resource_id")
        .applyInPandasWithState(
            _make_detect(timeout_ms),
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
