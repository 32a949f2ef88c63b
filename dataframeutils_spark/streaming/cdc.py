"""Streaming CDC apply — snapshot maintenance over a change stream.

The streaming twin of
:func:`dataframeutils_spark.operators.pipeline.apply_changes`: change
batches arrive as a file-source stream and each micro-batch is MERGEd
into the maintained snapshot inside ``foreachBatch`` — the standard
Structured-Streaming upsert pattern (Spark's own docs use exactly this
shape for Delta MERGE; here the snapshot is a plain DataFrame, no table
format required).

Correctness contract: as long as any given id's changes arrive within
one micro-batch (the driver fixture partitions ids across batch files),
sequential per-batch application commutes, and the final snapshot is
identical to the ONE-SHOT batch apply of all changes — which is
therefore the exact oracle. Ids spanning batches would additionally
need the snapshot to retain the applied ``seq`` for cross-batch
last-writer-wins; that variant is a column away, not a new operator.

Scale: each micro-batch pays one window over the (small) change batch
plus one join against the snapshot — identical to the batch operator;
``localCheckpoint`` truncates the snapshot's lineage each batch so a
long-running stream cannot accrete a plan of unioned joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dataframeutils_spark.operators.pipeline import apply_changes


class SnapshotMaintainer:
    """Holds the evolving snapshot across micro-batches; call
    :meth:`merge_batch` from ``foreachBatch``."""

    def __init__(self, snapshot: DataFrame, id_col: str = "doc_id") -> None:
        self.snapshot = snapshot
        self.id_col = id_col
        self.n_batches = 0

    def merge_batch(self, changes: DataFrame, batch_id: int) -> None:
        applied = apply_changes(self.snapshot, changes, id_col=self.id_col)
        # truncate lineage: without this, batch N's snapshot plan nests
        # N unions+joins and the stream slows superlinearly
        self.snapshot = applied.localCheckpoint(eager=True)
        self.n_batches += 1


def run_change_stream(
    snapshot: DataFrame,
    change_stream: DataFrame,
    id_col: str = "doc_id",
    timeout_s: int = 120,
) -> tuple[DataFrame, int]:
    """Drain ``change_stream`` (availableNow) applying every micro-batch
    to ``snapshot``; returns (final snapshot, micro-batch count)."""
    import shutil
    import tempfile

    spark = snapshot.sparkSession
    maintainer = SnapshotMaintainer(snapshot, id_col=id_col)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", spark.sparkContext.defaultParallelism
    )
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")
    try:
        q = (
            change_stream.writeStream.foreachBatch(maintainer.merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(timeout_s)
        # a drain that outlives the timeout must be STOPPED before the
        # snapshot is read — otherwise later micro-batches keep
        # reassigning maintainer.snapshot under the caller (and run with
        # the caller's restored shuffle conf); same guard as
        # streaming.windows.run_to_memory
        if q.isActive:
            q.stop()
            raise RuntimeError(
                f"change stream did not drain within {timeout_s}s "
                f"({maintainer.n_batches} micro-batches applied)"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        shutil.rmtree(ckpt, ignore_errors=True)
    return maintainer.snapshot, maintainer.n_batches
