"""Continuous compliance: run a compliance pack against every
micro-batch of a resource/change feed.

The reference evaluates packs on demand against the warehouse
(executor.go lifecycle); the streaming twin evaluates the SAME pack —
same loader, same parameter binding, same PASS/FAIL output contract,
same SQL — inside a ``foreachBatch`` sink, so a policy violation
surfaces within one trigger interval of the resource changing instead
of at the next scheduled scan.

Scale shape: each micro-batch registers as a temp view and the pack's
controls run as ordinary Spark SQL over it — per-batch cost is the
pack cost on the batch (not on history), and the appended result log
is partitioned by batch. Exactly-once: the checkpointed batch_id is
written with every result row, so replayed batches are idempotent to
downstream MERGE/dedup consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def start_continuous_compliance(stream: DataFrame, namespace: str,
                                out_path: str, checkpoint: str,
                                view_name: str = "resources",
                                loader=None,
                                params: dict | None = None,
                                available_now: bool = False):
    """Evaluate pack ``namespace`` on each micro-batch of ``stream``
    (registered as ``view_name``) and append the contract-conformant
    results — plus batch_id and evaluation time — to ``out_path``.

    Returns the StreamingQuery handle.
    """
    from corkscrew_spark.compliance import ComplianceExecutor

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df.createOrReplaceTempView(view_name)
        run = ComplianceExecutor(spark, loader=loader).run_pack(
            namespace, params=params)
        if run.errors:
            raise RuntimeError(f"continuous compliance errors: {run.errors}")
        (
            run.results
            .withColumn("batch_id", F.lit(batch_id))
            .withColumn("evaluated_at", F.current_timestamp())
            .write.mode("append").parquet(out_path)
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
