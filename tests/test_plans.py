"""plans/ layer: checkpoint resume, lineage counters, pipeline writes,
routing strategy equivalence."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from opentelemetry_collector_contrib_spark.operators import connectors  # noqa: E402
from opentelemetry_collector_contrib_spark.plans import (  # noqa: E402
    checkpoint as cp,
    pipeline,
)
from opentelemetry_collector_contrib_spark.sources import transcripts as src  # noqa: E402


@pytest.fixture(scope="module")
def turns(spark, sf_dir):
    return src.transcripts_df(spark, sf_dir).cache()


def test_checkpoint_run_stage_skips_completed(spark, turns, tmp_path):
    base = str(tmp_path)
    calls = []

    def build():
        calls.append(1)
        return turns.select("conv_id", "turn_idx")

    out1 = cp.run_stage(spark, base, "stage1", build)
    n = out1.count()
    out2 = cp.run_stage(spark, base, "stage1", build)
    assert out2.count() == n
    assert len(calls) == 1  # second run resumed from the checkpoint
    cp.run_stage(spark, base, "stage1", build, force=True)
    assert len(calls) == 2  # force re-runs


def test_lineage_counts_per_stage(spark, sf_dir):
    result = pipeline.build(spark, sf_dir)
    pipeline.per_sink_counts(result).collect()
    lin = result.lineage.collect()
    assert lin["parse"]["rows"] == 1000
    assert lin["parse"]["parse_errors"] == 300  # 30% freeform by construction
    assert lin["enrich"]["rows"] == 1000
    assert lin["route"]["rows"] == 1000


def test_pipeline_run_writes_readable_sinks(spark, sf_dir, tmp_path):
    res = pipeline.run(spark, sf_dir, out_dir=str(tmp_path))
    total = 0
    for sink, path in res["sink_paths"].items():
        df = spark.read.parquet(path)
        n = df.count()
        assert n == res["per_sink_counts"][sink]
        total += n
    assert total == sum(res["per_sink_counts"].values())


def test_resource_route_strategies_agree(spark, turns):
    routes = [
        connectors.Route(F.col("text").contains("FATAL"), ["inc"], "resource", "inc"),
        connectors.Route(F.col("role") == "tool", ["tools"], "log", "tools"),
    ]
    outs = {}
    for strat in ("broadcast", "window"):
        tagged, sink_map = connectors.route_logs(
            turns, routes, default_sinks=["rest"], resource_strategy=strat
        )
        routed = connectors.routed_union(tagged, sink_map)
        outs[strat] = sorted(
            (r["sink"], r["conv_id"], r["turn_idx"])
            for r in routed.select("sink", "conv_id", "turn_idx").collect()
        )
    assert outs["broadcast"] == outs["window"]


def test_route_attach_attributes(spark, turns):
    routes = [
        connectors.Route(F.col("role") == "tool", ["t"], "log", "tools",
                         attach={"route_tag": "tooling", "prio": "high"}),
        connectors.Route(F.col("role") == "user", ["u"], "log", "users",
                         attach={"route_tag": "human"}),
    ]
    tagged, _ = connectors.route_logs(turns, routes, default_sinks=["rest"])
    got = tagged.select("role", "_route", "route_tag", "prio").distinct().collect()
    for r in got:
        if r["_route"] == "tools":
            assert r["route_tag"] == "tooling" and r["prio"] == "high"
        elif r["_route"] == "users":
            assert r["route_tag"] == "human" and r["prio"] is None
        else:
            assert r["route_tag"] is None and r["prio"] is None


def test_attr_actions_where_gate(spark, turns):
    from opentelemetry_collector_contrib_spark.operators import processors

    df = processors.attr_upsert(
        turns, "flag", "yes", where=F.col("role") == "system"
    )
    got = {r["role"]: r["flag"] for r in df.select("role", "flag").distinct().collect()}
    assert got["system"] == "yes"
    assert all(v is None for k, v in got.items() if k != "system")


def test_arrow_batch_dedup_parity(spark, turns):
    from opentelemetry_collector_contrib_spark.operators import parsers
    from opentelemetry_collector_contrib_spark.schema import PARSE_PATTERN_NAMED

    plain = parsers.regex_parse_arrow(turns, PARSE_PATTERN_NAMED)
    dedup = parsers.regex_parse_arrow(turns, PARSE_PATTERN_NAMED, batch_dedup=True)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, dedup.collect()))
    assert a == b
