"""obsreport-style per-stage lineage & counters.

The reference reports accepted/refused/sent per component
(pkg/stanza/adapter/receiver.go:55-63; obsreport). Spark-first analog:
``DataFrame.observe`` named metrics — they ride along with the job, cost
nothing extra (no second pass), and are collected per action via
QueryExecutionListener or read back from ``Observation`` objects.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, functions as F


@dataclass
class Lineage:
    """Collects per-stage row counters without extra passes."""

    observations: dict[str, Observation] = field(default_factory=dict)

    def observe(self, df: DataFrame, stage: str, **extra) -> DataFrame:
        """Attach rows_in/rows_out style metrics to a stage boundary.

        ``extra`` maps metric name -> Column aggregate (e.g.
        ``errors=F.sum(F.col('parse_ok').cast('int'))``).
        """
        obs = Observation(stage)
        self.observations[stage] = obs
        metrics = [F.count(F.lit(1)).alias("rows")]
        metrics += [c.alias(n) for n, c in extra.items()]
        return df.observe(obs, *metrics)

    def collect(self) -> dict[str, dict]:
        """Metric values for all stages whose job has completed."""
        return {k: dict(v.get) for k, v in self.observations.items()}


def partition_metrics(df: DataFrame, stage: str, *, error_col: str | None = None):
    """Per-partition lineage rows ``(stage, partition_id, rows, errors)``
    — the distributed analog of obsreport's per-component counters
    (SURVEY.md §4 item 4). A narrow groupBy on spark_partition_id (at
    most one output row per partition, map-side combined); written
    alongside checkpoints by ``checkpoint.write_stage(...,
    with_lineage=True)`` so a resumed run can audit exactly what each
    partition contributed."""
    errors = (
        F.sum(F.col(error_col).cast("long")) if error_col else F.lit(0).cast("long")
    )
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"), errors.alias("errors"))
        .select(F.lit(stage).alias("stage"), "partition_id", "rows", "errors")
    )
