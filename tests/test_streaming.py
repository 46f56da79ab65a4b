"""Streaming pipeline tests: batch/stream parity, checkpoint resume,
stateful recombine."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from opentelemetry_collector_contrib_spark.operators import transformers  # noqa: E402
from opentelemetry_collector_contrib_spark.sources import transcripts as src  # noqa: E402
from opentelemetry_collector_contrib_spark.streaming import (  # noqa: E402
    pipeline as spipe,
)
from opentelemetry_collector_contrib_spark.streaming.recombine import (  # noqa: E402
    recombine_stream,
)


@pytest.fixture()
def turns(spark, sf_dir):
    return src.transcripts_df(spark, sf_dir)


def _await(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_matches_batch_per_sink_counts(spark, sf_dir, turns, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    turns.write.parquet(inp)

    q = spipe.run_to_sinks(spark, inp, sf_dir, out, ckpt)
    _await(q)

    routed = spark.read.parquet(f"{out}/routed")
    got = {r["sink"]: r["n"] for r in routed.groupBy("sink").count().withColumnRenamed("count", "n").collect()}

    # batch reference: same log-context routing table applied in batch
    tagged, sink_map = spipe.build_stream(spark, turns, sf_dir)
    from opentelemetry_collector_contrib_spark.operators import connectors

    expect = {
        r["sink"]: r["n"]
        for r in connectors.routed_union(tagged, sink_map)
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect

    # per-turn text equality under stable ordering, per sink
    batch_rows = sorted(
        (r["sink"], r["conv_id"], r["turn_idx"], r["text"])
        for r in connectors.routed_union(tagged, sink_map)
        .select("sink", "conv_id", "turn_idx", "text")
        .collect()
    )
    stream_rows = sorted(
        (r["sink"], r["conv_id"], r["turn_idx"], r["text"])
        for r in routed.select("sink", "conv_id", "turn_idx", "text").collect()
    )
    assert batch_rows == stream_rows


def test_stream_checkpoint_resume_no_duplicates(spark, sf_dir, turns, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    half1 = turns.filter(F.col("turn_idx") % 2 == 0)
    half2 = turns.filter(F.col("turn_idx") % 2 == 1)
    half1.write.mode("append").parquet(inp)

    _await(spipe.run_to_sinks(spark, inp, sf_dir, out, ckpt))
    n1 = spark.read.parquet(f"{out}/routed").count()

    half2.write.mode("append").parquet(inp)
    _await(spipe.run_to_sinks(spark, inp, sf_dir, out, ckpt))
    n2 = spark.read.parquet(f"{out}/routed").count()

    assert n1 > 0 and n2 > n1
    # totals equal one batch pass over everything — resume added ONLY the
    # new files (offset log = fingerprint/offset checkpoint analog)
    tagged, sink_map = spipe.build_stream(spark, turns, sf_dir)
    from opentelemetry_collector_contrib_spark.operators import connectors

    expect = connectors.routed_union(tagged, sink_map).count()
    assert n2 == expect
    # metrics table recorded both micro-batch rounds
    metrics = spark.read.parquet(f"{out}/metrics")
    assert metrics.select("batch_id").distinct().count() >= 2


def test_recombine_stream_matches_batch(spark, sf_dir, turns, tmp_path):
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    turns.write.parquet(inp)

    stream = spipe.read_transcript_stream(spark, inp).withColumn(
        "is_last", F.col("turn_idx") % 5 == 4
    )
    q = (
        recombine_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"], r["n_combined"])
        for r in spark.read.parquet(out).collect()
    )

    batch = transformers.recombine(
        turns, is_last=(F.col("turn_idx") % 5 == 4), combine_with="\n"
    )
    expect = sorted(
        (r["conv_id"], r["turn_idx"], r["text"], r["n_combined"])
        for r in batch.select("conv_id", "turn_idx", "text", "n_combined").collect()
    )
    # streaming leaves blocks that never saw is_last open (no timeout
    # under availableNow) — batch emits them; everything flushed must
    # match exactly, and open-block keys account for the difference
    got_keys = {(c, t) for c, t, _, _ in got}
    expect_map = {(c, t): (x, n) for c, t, x, n in expect}
    assert got_keys <= set(expect_map)
    for c, t, x, n in got:
        assert expect_map[(c, t)] == (x, n)
    # every complete (is_last-terminated) block was emitted by the stream
    complete = {
        (c, t)
        for c, t, x, n in expect
        if (t + n - 1) % 5 == 4  # block ends on an is_last row
    }
    assert complete <= got_keys


def test_log_dedup_stream_matches_batch_totals(spark, sf_dir, turns, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    turns.write.parquet(inp)
    stream = spipe.read_transcript_stream(spark, inp)
    dedup = spipe.log_dedup_stream(
        stream, ["role", "tool"], ts_col="ts", interval="1 hour", watermark="2 hours"
    )
    q = (
        dedup.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.read.parquet(out)
    # append mode emits only windows the watermark has closed: windows
    # ending within `watermark` of the max event time stay open — the
    # reference has no watermark at all (SURVEY §2.8), this is the
    # late-data bound Spark adds. Expected = rows in closed windows.
    max_ts = turns.agg(F.max("ts")).first()[0]
    closed = turns.filter(
        F.window("ts", "1 hour").end <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    )
    assert got.agg(F.sum("log_count")).first()[0] == closed.count()
    assert closed.count() > 0
    # each (window, role, tool) appears once
    assert (
        got.groupBy("flush_window", "role", "tool").count().filter("count > 1").count()
        == 0
    )


def test_with_file_attrs(spark, turns, tmp_path):
    p = str(tmp_path / "files")
    turns.write.parquet(p)
    df = src.with_file_attrs(spark.read.parquet(p))
    r = df.select("log_file_path", "log_file_name").first()
    assert r["log_file_path"].endswith(".parquet")
    assert "/" not in r["log_file_name"] and r["log_file_name"].endswith(".parquet")


def test_otlp_envelope_parse_in_stream(spark, turns, tmp_path):
    """The OTLP-JSON envelope parse (from_json + explodes) is stateless,
    so it runs unchanged under Structured Streaming — the
    otlpjsonfilereceiver's tail-and-parse mode. Stream output must equal
    the batch parse of the same envelope files."""
    from opentelemetry_collector_contrib_spark.operators import parsers

    inp = str(tmp_path / "envelopes")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    rec = F.struct(
        F.lpad(F.col("turn_idx").cast("string"), 6, "0").alias("timeUnixNano"),
        F.lit("INFO").alias("severityText"),
        F.struct(F.col("text").alias("stringValue")).alias("body"),
    )
    env = (
        turns.groupBy("conv_id")
        .agg(F.array_sort(F.collect_list(rec)).alias("logRecords"))
        .select(
            F.to_json(
                F.struct(
                    F.array(
                        F.struct(
                            F.struct(
                                F.array(
                                    F.struct(
                                        F.lit("conv.id").alias("key"),
                                        F.struct(
                                            F.col("conv_id").alias("stringValue")
                                        ).alias("value"),
                                    )
                                ).alias("attributes")
                            ).alias("resource"),
                            F.array(
                                F.struct(
                                    F.struct(
                                        F.lit("s").alias("name"),
                                        F.lit("1").alias("version"),
                                    ).alias("scope"),
                                    F.col("logRecords").alias("logRecords"),
                                )
                            ).alias("scopeLogs"),
                        )
                    ).alias("resourceLogs")
                )
            ).alias("text")
        )
    )
    env.write.mode("overwrite").parquet(inp)

    stream = spark.readStream.schema("text string").parquet(inp)
    parsed = parsers.otlp_json_parse(stream).select(
        F.col("resource_attrs")["conv.id"].alias("conv_id"),
        F.col("time_unix_nano").alias("tidx"),
        "body",
    )
    q = (
        parsed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(
        map(
            tuple,
            parsers.otlp_json_parse(spark.read.parquet(inp))
            .select(
                F.col("resource_attrs")["conv.id"].alias("conv_id"),
                F.col("time_unix_nano").alias("tidx"),
                "body",
            )
            .collect(),
        )
    )
    assert got == want and len(got) == turns.count()


def test_flush_interval_maps_to_processing_time_trigger(spark, sf_dir, turns, tmp_path):
    """fileexporter flush_interval (config.go:49-52) = micro-batch flush
    clock: the query runs on a processingTime trigger of that many
    seconds and data lands in the sink while the query stays active."""
    import time

    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    turns.limit(200).write.parquet(inp)
    q = spipe.run_to_sinks(
        spark, inp, sf_dir, out, ckpt, flush_interval=1
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(f"{out}/routed").count()
                if n > 0:
                    break
            except Exception:
                pass
            time.sleep(1)
        assert n > 0, "no flush within 60s"
        # continuous trigger: the query does NOT self-terminate
        assert q.isActive
    finally:
        q.stop()
