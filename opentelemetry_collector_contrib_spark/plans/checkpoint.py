"""Stage-boundary checkpointing for resumable batch runs.

Reference analog: the filelog receiver persists reader offsets through a
storage extension (pkg/stanza/fileconsumer/internal/checkpoint/
checkpoint.go:22,51) so a restart resumes where it left off. For a batch
DAG the unit of resume is a *stage*: each completed stage writes its
output to a deterministic path plus a ``_STAGE_DONE`` marker; re-runs
skip completed stages and re-read their parquet. Writes are idempotent
(overwrite into a per-stage directory) so a crash mid-write is safe.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

MARKER = "_STAGE_DONE"


def stage_done(base: str, stage: str) -> bool:
    return os.path.exists(os.path.join(base, stage, MARKER))


def write_stage(
    df: DataFrame,
    base: str,
    stage: str,
    *,
    partition_by: list[str] | None = None,
    with_lineage: bool = False,
    error_col: str | None = None,
) -> str:
    path = os.path.join(base, stage)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    if with_lineage:
        from .lineage import partition_metrics

        # metrics come from re-reading the parquet just written: one
        # cheap column-pruned scan whose partition ids correspond to the
        # STORED files — recomputing from `df` would re-execute the full
        # upstream DAG and report ids of a plan that never materialized
        stored = df.sparkSession.read.parquet(path)
        partition_metrics(stored, stage, error_col=error_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, f"{stage}._lineage"))
    with open(os.path.join(path, MARKER), "w") as f:
        json.dump({"stage": stage, "completed_at": time.time()}, f)
    return path


def read_stage(spark: SparkSession, base: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base, stage))


def run_stage(
    spark: SparkSession,
    base: str,
    stage: str,
    build,
    *,
    partition_by: list[str] | None = None,
    force: bool = False,
) -> DataFrame:
    """Run ``build()`` unless the stage already completed; either way return
    the stage output as a DataFrame backed by its checkpoint."""
    if force or not stage_done(base, stage):
        write_stage(build(), base, stage, partition_by=partition_by)
    return read_stage(spark, base, stage)
