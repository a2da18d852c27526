"""applyInPandasWithState: state must persist across micro-batches."""

from __future__ import annotations

import json
import time

from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from corkscrew_spark.streaming import stateful

SNAPSHOT_SCHEMA = StructType(
    [
        StructField("resource_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("checksum", StringType()),
    ]
)


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"snap-{time.time_ns()}.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    time.sleep(0.01)  # distinct mtimes → stable file order


def test_transitions_across_batches(spark, tmp_path):
    src = tmp_path / "snaps"
    # batch 1: three resources appear
    _write(src, [
        {"resource_id": "r-1", "ts": "2024-01-01T00:00:00", "checksum": "aaa"},
        {"resource_id": "r-2", "ts": "2024-01-01T00:00:00", "checksum": "bbb"},
        {"resource_id": "r-3", "ts": "2024-01-01T00:00:00", "checksum": "ccc"},
    ])
    # batch 2: r-1 changed, r-2 unchanged, r-3 changed twice in-batch
    _write(src, [
        {"resource_id": "r-1", "ts": "2024-01-01T01:00:00", "checksum": "aa2"},
        {"resource_id": "r-2", "ts": "2024-01-01T01:00:00", "checksum": "bbb"},
        {"resource_id": "r-3", "ts": "2024-01-01T01:00:00", "checksum": "cc2"},
        {"resource_id": "r-3", "ts": "2024-01-01T02:00:00", "checksum": "cc3"},
    ])

    stream = (
        spark.readStream.schema(SNAPSHOT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force one file per micro-batch
        .json(str(src))
    )
    transitions = stateful.detect_state_transitions(stream)
    q = (
        transitions.writeStream.format("memory")
        .queryName("transitions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (r["resource_id"], r["change_type"], r["prev_checksum"], r["checksum"])
        for r in spark.sql("SELECT * FROM transitions").collect()
    }
    assert ("r-1", "CREATE", None, "aaa") in rows
    assert ("r-2", "CREATE", None, "bbb") in rows
    # state from batch 1 seen in batch 2: prev_checksum crosses the batch line
    assert ("r-1", "UPDATE", "aaa", "aa2") in rows
    assert ("r-3", "UPDATE", "ccc", "cc2") in rows
    assert ("r-3", "UPDATE", "cc2", "cc3") in rows
    # unchanged snapshot emits nothing
    assert not [r for r in rows if r[0] == "r-2" and r[1] == "UPDATE"]
    assert len(rows) == 6  # 3 CREATE + 3 UPDATE
