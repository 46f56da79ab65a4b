"""plans/ layer: checkpoint resume, lineage counters, pipeline writes,
routing strategy equivalence."""

from __future__ import annotations

import os
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


def test_aqe_skew_join_backstop(spark):
    """SURVEY §4 names AQE skew-join splitting as the backstop when
    salting is off: a sort-merge join with one hot conv_id partition must
    be rewritten by OptimizeSkewedJoin (the executed plan carries
    skew=true) and still produce exact results."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k"
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50k")
        # force sort-merge (no broadcast escape hatch) — the point is the
        # skew split, not the broadcast strategy
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        n_tail, tail_turns, hot_rows = 2_000, 5, 120_000
        tail = spark.range(n_tail * tail_turns).select(
            F.concat_ws(
                "-", F.lit("conv"), (F.col("id") / tail_turns).cast("long")
            ).alias("conv_id"),
            F.concat(F.lit("payload text for skew test "), F.col("id")).alias(
                "text"
            ),
        )
        hot = spark.range(hot_rows).select(
            F.lit("conv-hot").alias("conv_id"),
            F.concat(F.lit("hot payload text for skew test "), F.col("id")).alias(
                "text"
            ),
        )
        facts = tail.unionAll(hot)
        dim = spark.range(n_tail + 1).select(
            F.when(F.col("id") < n_tail, F.concat_ws("-", F.lit("conv"), F.col("id")))
            .otherwise(F.lit("conv-hot"))
            .alias("conv_id"),
            (F.col("id") % 7).cast("int").alias("team_id"),
        )
        joined = facts.join(dim, "conv_id")
        collected = joined.collect()
        # exact results survive the skew split: every fact row joined
        assert len(collected) == n_tail * tail_turns + hot_rows
        hot_team = n_tail % 7
        assert (
            sum(1 for r in collected if r["team_id"] == hot_team) >= hot_rows
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_scan_pruning_and_filter_pushdown(spark, sf_dir):
    """Column pruning + predicate pushdown reach the parquet scan: a
    2-column projection must read a 2-column ReadSchema, and the filter
    must appear in PushedFilters — the difference between scanning 2
    columns and scanning all of a 100 TB table."""
    from opentelemetry_collector_contrib_spark.sources import documents as docsrc

    docs = docsrc.documents_df(spark, sf_dir)
    q = docs.filter(F.col("doc_id") < 100).select("doc_id", "lang")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "Scan parquet" in l or "FileScan" in l)
    assert "PushedFilters: [" in plan and "LessThan(doc_id,100)" in plan, plan
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "text" not in schema_line and "doc_id" in schema_line, schema_line


def test_parse_pipeline_single_codegen_span(spark, sf_dir):
    """The parse->severity->kv hot path stays inside whole-stage codegen
    with no exchange and no Python (SURVEY §4 invariant)."""
    from opentelemetry_collector_contrib_spark.operators import parsers
    from opentelemetry_collector_contrib_spark.schema import (
        PARSE_GROUPS,
        PARSE_PATTERN,
    )
    from opentelemetry_collector_contrib_spark.sources import transcripts as src

    turns = src.transcripts_df(spark, sf_dir)
    out = parsers.severity_parse(
        parsers.regex_parse(turns, PARSE_PATTERN, PARSE_GROUPS)
    ).select("conv_id", "severity_num", "msg")
    plan = out._jdf.queryExecution().executedPlan().toString()
    body = plan.split("== Initial Plan ==")[0]
    # the input-derivation window is upstream of the parse; the parse
    # stages themselves must add no exchange beyond it and no Python
    assert "ArrowEvalPython" not in body and "BatchEvalPython" not in body
    # "*(n)" prefixes mark whole-stage-codegen spans in the plan string
    assert "*(1)" in body


def test_write_stage_lineage_from_stored_files(spark, turns, tmp_path):
    """with_lineage metrics come from re-reading the written parquet
    (one cheap scan over stored files), and their totals match the data
    actually persisted — including the error counter."""
    base = str(tmp_path)
    df = turns.select(
        "conv_id", "turn_idx", (F.col("turn_idx") % 5 == 0).alias("is_err")
    )
    cp.write_stage(df, base, "st", with_lineage=True, error_col="is_err")
    stored = cp.read_stage(spark, base, "st")
    lin = spark.read.parquet(f"{base}/st._lineage")
    rows = lin.collect()
    assert all(r["stage"] == "st" for r in rows)
    assert sum(r["rows"] for r in rows) == stored.count()
    assert sum(r["errors"] for r in rows) == stored.filter("is_err").count()
    assert cp.stage_done(base, "st")


def test_write_routed_rotation_bounds_file_size(spark, turns, tmp_path):
    """fileexporter rotation analog: maxRecordsPerFile bounds every
    output file; all rows still land exactly once."""
    import glob

    tagged = turns.withColumn("_route", F.lit("all"))
    paths = connectors.write_routed(
        tagged, {"all": ["only"]}, str(tmp_path),
        max_records_per_file=100, files_per_sink=2,
    )
    files = glob.glob(paths["only"] + "/*.parquet")
    assert files
    total = 0
    for f in files:
        n = spark.read.parquet(f).count()
        assert n <= 100, f
        total += n
    assert total == turns.count()


def test_count_connector_multi_single_scan(spark, turns):
    """countconnector multi-metric config (config.go:35-51): N named
    metrics with own conditions/attrs/defaults compile to ONE scan of the
    fact table — N separate count_connector calls would be N scans."""
    out = connectors.count_connector_multi(
        turns,
        {
            "all.by_tool_role": connectors.MetricSpec(attrs=["tool", "role"]),
            "all.by_tool_default": connectors.MetricSpec(
                attrs=["tool"], defaults={"tool": "none"}
            ),
            "assistant.turns": connectors.MetricSpec(
                attrs=["role"], conditions=['role == "assistant"']
            ),
        },
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    n_scans = plan.count("LogicalRDD") + plan.count("Relation")
    assert n_scans == 1, plan
    rows = {(r["metric"], r["tool"], r["role"]): r["value"] for r in out.collect()}
    # metric 1 equals the single-metric connector on the same input
    single = {
        (r["tool"], r["role"]): r["n"]
        for r in connectors.count_connector(
            turns, ["tool", "role"], name="n"
        ).collect()
    }
    got1 = {
        (t, ro): v for (m, t, ro), v in rows.items() if m == "all.by_tool_role"
    }
    assert got1 == single
    # metric 2: defaults fill missing tool; totals preserved
    assert sum(v for (m, _, _), v in rows.items() if m == "all.by_tool_default") \
        == turns.count()
    # metric 3: OTTL condition compiled by the connector
    n_assistant = turns.filter(F.col("role") == "assistant").count()
    assert rows[("assistant.turns", None, "assistant")] == n_assistant


def test_sum_connector_multi_matches_single(spark, turns):
    base = turns.withColumn("items", F.length("text").cast("long"))
    out = connectors.sum_connector_multi(
        base,
        {
            "chars.by_role": connectors.MetricSpec(attrs=["role"], source="items"),
            "chars.assistant": connectors.MetricSpec(
                attrs=["role"], source="items",
                conditions=['role == "assistant"'],
            ),
        },
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") + plan.count("Relation") == 1, plan
    rows = {(r["metric"], r["role"]): r["value"] for r in out.collect()}
    single = {
        r["role"]: r["s"]
        for r in connectors.sum_connector(base, "items", ["role"], name="s").collect()
    }
    assert {ro: v for (m, ro), v in rows.items() if m == "chars.by_role"} == single
    assert ("chars.assistant", "assistant") in rows
    assert ("chars.assistant", "system") not in rows


def test_sink_catalog_iceberg_branch(spark, turns, tmp_path):
    """Exercises the fmt == "iceberg" branch of SinkCatalog end-to-end
    (write -> overwritePartitions -> read).

    ENVIRONMENT-BLOCKED in this container: needs the Iceberg runtime jar
    ``org.apache.iceberg:iceberg-spark-runtime-4.0_2.13`` (matching the
    installed Spark 4.x / Scala 2.13) on the driver classpath plus a
    catalog config such as
    ``spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog``
    with ``type=hadoop`` and a ``warehouse`` path. When the jar is
    present the probe flips this test on automatically — the branch is
    tested, not dead code.

    Staging channels exhausted (verified 2026-08-17, round 4):
      * DNS/network fully blocked (``repo1.maven.org`` unresolvable) —
        no ``--packages``/ivy fetch possible;
      * no local ivy/maven caches (``~/.ivy2``, ``~/.m2`` absent);
      * filesystem sweep ``find / -name '*iceberg*'`` finds no jar;
      * pyspark's bundled ``jars/`` (286 jars) has no iceberg/delta/hudi;
      * pip index unreachable (``pip download pyiceberg`` → "no
        versions") — and pyiceberg would not provide the Spark runtime
        jar anyway.

    Re-verified 2026-08-17, round 5: DNS still blocked
    (``repo1.maven.org`` unresolvable via curl and getent); a coursier
    cache exists (``~/.cache/coursier``) but contains no iceberg
    artifact and its cached channel is not a public endpoint; no ivy/m2
    caches; no new jar anywhere on disk; pyiceberg still absent.
    """
    from opentelemetry_collector_contrib_spark.sources import catalog as cat

    if not cat.iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime jar not on classpath (offline container); "
            "see docstring for the exact staging requirement"
        )
    sc = cat.SinkCatalog(spark, str(tmp_path), fmt="iceberg")
    tbl = "local.db.turns_smoke"
    sample = turns.limit(50).withColumn("sink", F.lit("a"))
    sample.writeTo(tbl).using("iceberg").partitionedBy(F.col("sink")).create()
    sc.overwrite_partitions(sample, tbl, partition_by=["sink"])
    assert sc.read(tbl).count() == 50
    sc.append(sample, tbl, partition_by=["sink"])
    assert sc.read(tbl).count() == 100


def test_fileexporter_proto_roundtrip(spark, turns, tmp_path):
    """fileexporter format: proto (exporter/fileexporter/config.go:22-52):
    records encode as OTLP LogsData protobuf wire frames written varint-
    length-delimited per partition; a wire-level decode must round-trip
    body, attributes, resource attributes, severity, and timestamp."""
    from opentelemetry_collector_contrib_spark.operators import proto

    sample = (
        turns.limit(20)
        .withColumn("severity_text", F.lit("INFO"))
        .withColumn("severity_number", F.lit(9))
    )
    enc = proto.encode_logs_proto(
        sample,
        body_col="text",
        ts_col="ts",
        severity_text_col="severity_text",
        severity_number_col="severity_number",
        attr_cols=["role", "tool"],
        resource_attr_cols=["conv_id"],
        scope_name="transcripts",
    )
    out_dir = str(tmp_path / "proto_sink")
    n_files = proto.write_proto_files(enc.repartition(3), out_dir)
    assert 1 <= n_files <= 3
    decoded = proto.decode_logs_proto(out_dir)
    assert len(decoded) == 20
    expect = {
        r["text"]: r for r in sample.select(
            "text", "role", "tool", "conv_id", "ts"
        ).collect()
    }
    for rec in decoded:
        src = expect[rec["body"]]
        assert rec["attrs"]["role"] == src["role"]
        assert rec["resource"]["conv_id"] == src["conv_id"]
        assert rec["scope"] == "transcripts"
        assert rec["severity_text"] == "INFO" and rec["severity_number"] == 9
        import calendar
        want_ns = int(calendar.timegm(src["ts"].timetuple())) * 10**9 \
            + src["ts"].microsecond * 1000
        assert rec["ts"] == want_ns


def test_count_connector_multi_grand_total_metric(spark, turns):
    """A metric with NO attributes is a grand total (the reference
    allows attribute-less metrics) — empty grouping set in the same
    single pass."""
    out = connectors.count_connector_multi(
        turns,
        {
            "all.turns": connectors.MetricSpec(attrs=[]),
            "by.role": connectors.MetricSpec(attrs=["role"]),
        },
    )
    rows = {(r["metric"], r["role"]): r["value"] for r in out.collect()}
    assert rows[("all.turns", None)] == turns.count()
    roles = {ro: v for (m, ro), v in rows.items() if m == "by.role"}
    assert sum(roles.values()) == turns.count() and len(roles) == 4


def test_proto_null_ts_and_null_resource_attr(spark, tmp_path):
    """Code-review regressions: a null timestamp omits the field instead
    of crashing the task; a null resource attribute is absent on the
    wire, not the string \"None\"; rewriting a sink dir clears stale
    frames."""
    from opentelemetry_collector_contrib_spark.operators import proto

    d = spark.createDataFrame(
        [("b1", None, "c1"), ("b2", "2024-01-01 00:00:00", None)],
        "text string, raw string, conv_id string",
    ).select("text", F.to_timestamp("raw").alias("ts"), "conv_id")
    enc = proto.encode_logs_proto(
        d, body_col="text", ts_col="ts", resource_attr_cols=["conv_id"]
    )
    out_dir = str(tmp_path / "p")
    proto.write_proto_files(enc, out_dir)
    recs = {r["body"]: r for r in proto.decode_logs_proto(out_dir)}
    assert "ts" not in recs["b1"] and recs["b1"]["resource"] == {"conv_id": "c1"}
    assert recs["b2"]["ts"] > 0 and recs["b2"]["resource"] == {}
    # overwrite semantics: second write with one row leaves one frame
    proto.write_proto_files(enc.limit(1).repartition(1), out_dir)
    assert len(proto.decode_logs_proto(out_dir)) == 1


def test_count_connector_multi_randomized_vs_single(spark):
    """Randomized (seeded) configs: the one-pass multi-metric result
    must equal N independent single-metric connector calls."""
    import random

    rng = random.Random(42)
    rows = [
        (
            rng.choice(["", "a", "b", "c", None]),
            rng.choice(["x", "y"]),
            rng.randint(0, 5),
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "tool string, role string, v int")
    for trial in range(3):
        specs = {}
        for m in range(rng.randint(2, 4)):
            attrs = rng.sample(["tool", "role"], rng.randint(0, 2))
            defaults = (
                {"tool": "none"}
                if "tool" in attrs and rng.random() < 0.5
                else {}
            )
            cond = (
                [f'v >= {rng.randint(0, 4)}'] if rng.random() < 0.5 else None
            )
            specs[f"m{trial}.{m}"] = connectors.MetricSpec(
                attrs=attrs, defaults=defaults, conditions=cond
            )
        multi = connectors.count_connector_multi(df, specs)
        got = {}
        for r in multi.collect():
            d = r.asDict()
            got[(d["metric"], d.get("tool"), d.get("role"))] = d["value"]
        for name, spec in specs.items():
            from opentelemetry_collector_contrib_spark.operators import ottl

            cond_col = None
            if spec.conditions:
                cond_col = ottl.compile_condition(df, spec.conditions[0])
            single = connectors.count_connector(
                df, spec.attrs, condition=cond_col,
                defaults=spec.defaults, name="n",
            )
            want = {}
            for r in single.collect():
                key = (
                    name,
                    str(r["tool"]) if "tool" in spec.attrs else None,
                    str(r["role"]) if "role" in spec.attrs else None,
                )
                want[key] = r["n"]
            mine = {k: v for k, v in got.items() if k[0] == name}
            assert mine == want, (name, spec)


def test_pack_sequences_matches_python_greedy(spark):
    """The JVM fold must equal a plain-Python next-fit reference on the
    same per-shard order."""
    import random

    from opentelemetry_collector_contrib_spark.functions import packing

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 150)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    budget = 100
    out = packing.pack_sequences(df, budget=budget, num_shards=4, seed=9)
    got = {
        (r["shard"], r["bin_idx"]): (list(r["doc_ids"]), r["total_tokens"])
        for r in out.collect()
    }

    # python reference: same shard/order hashes pulled from Spark
    import pyspark.sql.functions as SF

    keyed = df.select(
        "doc_id", "n_tokens",
        SF.pmod(SF.xxhash64("doc_id", SF.lit(9)), SF.lit(4)).alias("shard"),
        SF.xxhash64("doc_id", SF.lit(10)).alias("o"),
    ).collect()
    shards: dict = {}
    for r in sorted(keyed, key=lambda r: (r["shard"], r["o"])):
        shards.setdefault(r["shard"], []).append((r["doc_id"], r["n_tokens"]))
    want = {}
    for sh, docs in shards.items():
        bins, cur, sz = [], [], 0
        for d, t in docs:
            if cur and sz + t > budget:
                bins.append((cur, sz))
                cur, sz = [], 0
            cur.append(d)
            sz += t
        if cur:
            bins.append((cur, sz))
        for i, (ids, tot) in enumerate(bins):
            want[(sh, i)] = (ids, tot)
    assert got == want


def test_pipeline_metrics_single_pass_block(spark, sf_dir):
    """The flagship's metric block (north star: per-sink counts +
    per-tool/per-role histograms) in one multi-metric pass; its per-sink
    slice must equal the standalone per_sink_counts connector."""
    from opentelemetry_collector_contrib_spark.plans import pipeline as pl

    res = pl.run(spark, sf_dir, with_histograms=True)
    per_sink_from_block = {
        m["sink"]: m["value"]
        for m in res["metrics"]
        if m["metric"] == "records.per_sink"
    }
    assert per_sink_from_block == res["per_sink_counts"]
    tools = [m for m in res["metrics"] if m["metric"] == "turns.per_tool"]
    assert {m["tool"] for m in tools} >= {"bash", "none"}
    roles = [m for m in res["metrics"] if m["metric"] == "turns.per_sink_role"]
    assert sum(m["value"] for m in roles) == sum(res["per_sink_counts"].values())


def test_stdout_and_drop_exports(spark, turns, capsys):
    import json

    n = connectors.stdout_export(turns.select("conv_id", "turn_idx"), limit=3)
    out = capsys.readouterr().out.strip().splitlines()
    assert n == 3 and len(out) == 3
    assert {"conv_id", "turn_idx"} <= set(json.loads(out[0]))
    connectors.drop_export(turns.limit(10))  # executes, no output


def test_spark_submit_py_files_entrypoint(tmp_path):
    """North-rule invocation path: the pipeline runs via
    `spark-submit --py-files <package.zip> cli.py` as a standalone
    script (no pip install), producing the same per-sink counts."""
    import json
    import shutil
    import subprocess
    import zipfile

    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(submit):
        pytest.skip("spark-submit not on PATH")
    pkg_zip = str(tmp_path / "pkg.zip")
    root = "/root/repo"
    with zipfile.ZipFile(pkg_zip, "w") as z:
        for dirpath, _dirs, files in os.walk(
            os.path.join(root, "opentelemetry_collector_contrib_spark")
        ):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, root))
    proc = subprocess.run(
        [
            submit, "--master", "local[4]", "--py-files", pkg_zip,
            "--conf", "spark.ui.enabled=false",
            os.path.join(root, "opentelemetry_collector_contrib_spark/cli.py"),
            "--input-dir", "/root/testdata/sf0.001",
            "--out-dir", str(tmp_path / "out"),
        ],
        capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["per_sink_counts"] == {
        "audit": 147, "catchall": 246, "errors": 147,
        "incident": 565, "risky_tools": 42,
    }


def test_write_routed_max_megabytes_and_backups(spark, turns, tmp_path):
    """rotation.max_megabytes translates a byte cap into a records-per-
    file bound via per-sink row sizes; rotation.max_backups rotates the
    prior generation WHOLE into a sibling routed_backups tree and keeps
    the N newest generations (lumberjack's bounded retention — live
    reads never see backup rows, a backup is a complete rollback
    point)."""
    import glob
    import os

    tagged = turns.withColumn("_route", F.lit("all"))
    paths = connectors.write_routed(
        tagged, {"all": ["only"]}, str(tmp_path / "mb"),
        max_megabytes=1, files_per_sink=2,
    )
    files = glob.glob(paths["only"] + "/*.parquet")
    assert files
    total = sum(spark.read.parquet(f).count() for f in files)
    assert total == turns.count()
    for f in files:
        # JSON-length estimate is a parquet overestimate -> files must
        # come in under the byte cap
        assert os.path.getsize(f) <= 1 << 20

    # four consecutive writes with max_backups=2: the live sink dir
    # always holds EXACTLY the current generation (a bulk read is never
    # polluted by backup rows), each retained backup generation is
    # COMPLETE (full row count), and generations beyond the bound are
    # deleted oldest-first
    n = turns.count()
    for _ in range(4):
        paths2 = connectors.write_routed(
            tagged, {"all": ["only"]}, str(tmp_path / "bk"),
            files_per_sink=4, max_backups=2,
        )
        live = glob.glob(paths2["only"] + "/part-*")
        assert len(live) == 4  # current generation only, never pruned
        assert spark.read.parquet(paths2["only"]).count() == n
    gen_dirs = sorted(
        os.path.basename(p)
        for p in glob.glob(str(tmp_path / "bk" / "routed_backups" / "gen-*"))
    )
    assert gen_dirs == ["gen-1", "gen-2"]  # 2 newest of gens 0..2
    for g in gen_dirs:
        gp = str(tmp_path / "bk" / "routed_backups" / g / "sink=only")
        assert len(glob.glob(gp + "/part-*")) == 4  # complete generation
        assert spark.read.parquet(gp).count() == n


def test_sink_catalog_iceberg_invocation_chain(spark, turns):
    """The Iceberg jar cannot be staged offline (channels documented on
    the skip-marked end-to-end test above), but the branch's LOGIC is
    executable without it: mock the writeTo/read chains and assert the
    catalog issues exactly the Iceberg DataFrameWriterV2 / reader calls
    the real jar would receive."""
    from unittest import mock

    from opentelemetry_collector_contrib_spark.sources import catalog as cat

    sc = cat.SinkCatalog(spark, "/tmp/unused", fmt="iceberg")
    df = turns.limit(1)

    with mock.patch.object(type(df), "writeTo") as wt:
        sc.overwrite_partitions(df, "local.db.audit", partition_by=["role"])
        wt.assert_called_once_with("local.db.audit")
        wt.return_value.overwritePartitions.assert_called_once_with()

    with mock.patch.object(type(df), "writeTo") as wt:
        sc.append(df, "local.db.audit", partition_by=["role"])
        wt.assert_called_once_with("local.db.audit")
        wt.return_value.append.assert_called_once_with()

    with mock.patch.object(type(spark), "read", new_callable=mock.PropertyMock) as rd:
        sc.read("local.db.audit")
        rd.return_value.format.assert_called_once_with("iceberg")
        rd.return_value.format.return_value.load.assert_called_once_with(
            "local.db.audit"
        )


def test_write_routed_max_days_age_retention(spark, turns, tmp_path):
    """rotation.max_days (lumberjack MaxAge): backup generations older
    than 24h*N by filesystem modification time are deleted; fresh ones
    and the live generation are kept."""
    import glob
    import os

    tagged = turns.withColumn("_route", F.lit("all"))
    base = str(tmp_path / "age")
    # two writes -> one backup generation (gen-0)
    connectors.write_routed(tagged, {"all": ["only"]}, base, max_days=1)
    connectors.write_routed(tagged, {"all": ["only"]}, base, max_days=1)
    gen0 = os.path.join(base, "routed_backups", "gen-0")
    assert os.path.isdir(os.path.join(gen0, "sink=only"))
    # age gen-0 beyond the cutoff (pruning reads the GENERATION dir's
    # modtime), then a third write prunes it while the (fresh) gen-1
    # from that same write survives
    os.utime(gen0, (1000, 1000))
    connectors.write_routed(tagged, {"all": ["only"]}, base, max_days=1)
    gens = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(base, "routed_backups", "gen-*"))
    )
    assert gens == ["gen-1"]
    n = turns.count()
    assert spark.read.parquet(os.path.join(base, "routed", "sink=only")).count() == n


def test_write_routed_max_days_zero_rejected(spark, turns, tmp_path):
    # lumberjack MaxAge=0 means disabled; here that's None — an explicit
    # 0 would silently delete every backup, so it fails loudly instead
    tagged = turns.withColumn("_route", F.lit("all"))
    with pytest.raises(ValueError, match="max_days"):
        connectors.write_routed(
            tagged, {"all": ["only"]}, str(tmp_path / "z"), max_days=0
        )


def test_write_routed_rotation_staging_and_dropped_sinks(spark, turns, tmp_path):
    """With rotation on: max_backups=0 retains ALL generations
    (lumberjack's zero value); a sink present on disk but dropped from
    a later run's config still rotates to a backup instead of being
    destroyed by the overwrite; no staging residue is left behind."""
    import glob
    import os

    base = str(tmp_path / "rot")
    two = turns.withColumn(
        "_route", F.when(F.col("role") == "user", "u").otherwise("rest")
    )
    n = turns.count()
    connectors.write_routed(two, {"u": ["a", "b"]}, base, max_backups=0)
    # second run drops sink b entirely
    one = turns.withColumn("_route", F.lit("all"))
    paths = connectors.write_routed(one, {"all": ["a"]}, base, max_backups=0)
    # live tree holds only the new generation's sinks
    live_sinks = sorted(
        os.path.basename(p) for p in glob.glob(base + "/routed/sink=*")
    )
    assert live_sinks == ["sink=a"]
    assert spark.read.parquet(paths["a"]).count() == n
    # the dropped sink's data survived as a backup generation
    b_gens = glob.glob(base + "/routed_backups/gen-*/sink=b")
    assert len(b_gens) == 1
    assert spark.read.parquet(b_gens[0]).count() > 0
    # max_backups=0 retained sink a's prior generation too
    assert len(glob.glob(base + "/routed_backups/gen-*/sink=a")) == 1
    # third run: still retain-all -> two generations for sink a
    connectors.write_routed(one, {"all": ["a"]}, base, max_backups=0)
    assert len(glob.glob(base + "/routed_backups/gen-*/sink=a")) == 2
    assert not os.path.exists(base + "/routed__staging")
    with pytest.raises(ValueError, match="max_backups"):
        connectors.write_routed(one, {"all": ["a"]}, base, max_backups=-1)


def test_config_rejects_operators_outside_logstransform(spark, sf_dir):
    from opentelemetry_collector_contrib_spark.plans import config_pipeline as cfgp2

    with pytest.raises(ValueError, match="only valid under logstransform"):
        cfgp2.build_from_config(
            spark, sf_dir,
            {"processors": [
                {"type": "redact", "allowed": [], "operators": [
                    {"type": "json_parser"}]}
            ]},
        )


def test_write_routed_recovers_stranded_staging(spark, turns, tmp_path):
    """Crash-window recovery: if a prior run died after deleting the
    live tree but before renaming staging in (the one window where the
    committed generation exists ONLY in staging, marked by _SUCCESS),
    the next rotating write promotes it — so its rows end up as a
    normal backup generation, never silently destroyed."""
    import glob
    import os
    import shutil

    base = str(tmp_path / "rec")
    tagged = turns.withColumn("_route", F.lit("all"))
    n = turns.count()
    connectors.write_routed(tagged, {"all": ["only"]}, base, max_backups=2)
    # simulate the crash: live tree became staging (with _SUCCESS), live gone
    shutil.move(base + "/routed", base + "/routed__staging")
    assert os.path.exists(base + "/routed__staging/_SUCCESS")
    paths = connectors.write_routed(
        tagged, {"all": ["only"]}, base, max_backups=2
    )
    # live = the new write; the stranded generation became gen-0
    assert spark.read.parquet(paths["only"]).count() == n
    gens = glob.glob(base + "/routed_backups/gen-*/sink=only")
    assert len(gens) == 1
    assert spark.read.parquet(gens[0]).count() == n
    # staging WITHOUT _SUCCESS (failed job debris) is discarded instead
    os.makedirs(base + "/routed__staging/sink=only", exist_ok=True)
    with open(base + "/routed__staging/sink=only/part-junk", "w") as f:
        f.write("x")
    connectors.write_routed(tagged, {"all": ["only"]}, base, max_backups=2)
    assert not os.path.exists(base + "/routed__staging")
    assert spark.read.parquet(paths["only"]).count() == n


def test_write_routed_recovers_after_rotate_precommit_crash(spark, turns, tmp_path):
    # crash between rotation and the live-tree delete: live root exists
    # but holds only _SUCCESS (no sink dirs) while staging carries the
    # committed generation — recovery must promote, not discard
    import glob
    import os
    import shutil

    base = str(tmp_path / "rec2")
    tagged = turns.withColumn("_route", F.lit("all"))
    n = turns.count()
    connectors.write_routed(tagged, {"all": ["only"]}, base, max_backups=2)
    shutil.move(base + "/routed", base + "/routed__staging")
    os.makedirs(base + "/routed")
    open(base + "/routed/_SUCCESS", "w").close()  # sink-less live root
    paths = connectors.write_routed(
        tagged, {"all": ["only"]}, base, max_backups=2
    )
    assert spark.read.parquet(paths["only"]).count() == n
    gens = glob.glob(base + "/routed_backups/gen-*/sink=only")
    assert len(gens) == 1
    assert spark.read.parquet(gens[0]).count() == n
