"""Streaming mode: the same parse -> enrich -> route -> aggregate DAG as
a Structured Streaming job.

Reference mapping:
  * filelog receiver tailing + fingerprint/offset checkpoints
    (pkg/stanza/fileconsumer/file.go; internal/checkpoint/checkpoint.go)
    -> `readStream` file source + the streaming checkpoint log: Spark's
    source offsets ARE the fingerprint+offset store, exactly-once per
    file instead of per byte-range.
  * batching emitter 100 entries / 100 ms (helper/emitter.go:39-40)
    -> micro-batch trigger (`processingTime` in production,
    `availableNow` in tests/backfills).
  * per-sink exporters -> foreachBatch writing one partitionBy("sink")
    parquet job per micro-batch, plus per-sink running counts.
  * obsreport accepted/sent counters -> per-batch metrics rows appended
    to a metrics table by foreachBatch.

The stage functions are the SAME code as batch (parsers/processors/
connectors modules): everything in the hot path is a narrow column
transformation or a stream-static broadcast join, both streaming-legal.
The one batch-only construct is the resource-context route (a window
over conv_id); streaming restricts the routing table to log-context
routes — the reference's routing connector is likewise per-record when
run in `log` context (connector/routingconnector/logs.go:86-100).

No event-time watermark is used, mirroring the reference's
processing-time-only semantics (SURVEY.md §2.8); `log_dedup_stream`
below shows the watermarked variant Spark adds for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import connectors, parsers, processors
from ..schema import PARSE_PATTERN, PARSE_GROUPS, TRANSCRIPT_SCHEMA
from ..sources import transcripts as src

__all__ = ["read_transcript_stream", "build_stream", "run_to_sinks", "log_dedup_stream"]


def read_transcript_stream(
    spark: SparkSession, input_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of transcript-shaped parquet (the filelog
    receiver analog: new files in the directory = newly discovered logs;
    the checkpoint offset log replaces fingerprint dedup)."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def build_stream(
    spark: SparkSession, stream: DataFrame, sf_dir: str
) -> tuple[DataFrame, dict[str, list[str]]]:
    """Same logical stages as plans.pipeline.build, on a streaming DF.

    Routing table = the log-context subset of DEFAULT_ROUTES (resource
    context needs a conversation-wide window -> batch only)."""
    parsed = parsers.regex_parse(stream, PARSE_PATTERN, PARSE_GROUPS)
    parsed = parsers.severity_parse(parsed, parse_from="level")
    enriched = processors.enrich_lookup(
        parsed, src.conv_dim_df(spark, sf_dir), on="conv_id"
    )
    enriched = processors.enrich_lookup(enriched, src.tool_dim_df(spark), on="tool")
    routes = [
        connectors.Route(
            condition=F.col("level").isin("ERROR", "FATAL"),
            sinks=["errors", "audit"],
            context="log",
            name="errors",
        ),
        connectors.Route(
            condition=(F.col("tool") != "") & (F.col("risk_tier") == "high"),
            sinks=["risky_tools"],
            context="log",
            name="risky_tools",
        ),
    ]
    return connectors.route_logs(enriched, routes, default_sinks=["catchall"])


def run_to_sinks(
    spark: SparkSession,
    input_dir: str,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    processing_time: str = "5 seconds",
    flush_interval: float | None = None,
):
    """Start the streaming job writing per-sink parquet + per-batch
    metrics. foreachBatch gives the per-micro-batch hook the exporters
    need (one atomic partitionBy write per batch; append mode).

    ``flush_interval`` is the fileexporter's flush_interval config
    (exporter/fileexporter/config.go:49-52, seconds): data becomes
    visible in the sink at most that often. In the micro-batch model the
    processingTime trigger IS the flush clock, so the knob maps onto it
    directly (and turns availableNow off)."""
    if flush_interval is not None:
        available_now = False
        processing_time = f"{flush_interval} seconds"
    tagged, sink_map = build_stream(
        spark, read_transcript_stream(spark, input_dir), sf_dir
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        routed = connectors.routed_union(batch_df, sink_map)
        routed.persist()
        try:
            routed.write.mode("append").partitionBy("sink").parquet(
                f"{out_dir}/routed"
            )
            # obsreport-style per-batch counters
            (
                routed.groupBy("sink")
                .agg(F.count(F.lit(1)).alias("n"))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(f"{out_dir}/metrics")
            )
        finally:
            routed.unpersist()

    writer = (
        tagged.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def log_dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "ts",
    interval: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming logdedup (processor/logdedupprocessor/processor.go:85-133):
    the flush `interval` becomes a tumbling event-time window; Spark's
    watermark adds the late-data bound the reference lacks."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, interval).alias("flush_window"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("log_count"),
            F.min(ts_col).alias("first_observed_ts"),
            F.max(ts_col).alias("last_observed_ts"),
        )
    )
