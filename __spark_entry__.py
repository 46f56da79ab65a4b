"""Driver contract: flagship entry + per-operator queries + DuckDB oracles.

Every query here is an operator from SURVEY.md §2 applied to the
deterministic ``transcripts`` table (BASELINE.json input_hint shape),
which both engines derive from the driver's parquet through ONE portable
SQL string (opentelemetry_collector_contrib_spark/sources/transcripts.py)
— so oracle comparisons check operator semantics, not generator drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from opentelemetry_collector_contrib_spark.operators import (
    connectors,
    parsers,
    processors,
    transformers,
)
from opentelemetry_collector_contrib_spark.plans import pipeline
from opentelemetry_collector_contrib_spark.schema import (
    PARSE_PATTERN,
    PARSE_GROUPS,
    PARSE_PATTERN_NAMED,
    SEVERITY_ALIASES,
    SEVERITY_TEXT_TO_NUM,
)
from opentelemetry_collector_contrib_spark.sources import transcripts as src

SF0001 = "/root/testdata/sf0.001"

# DuckDB-flavored pattern (same regex, backslashes literal in duckdb strings)
_PAT_SQL = PARSE_PATTERN.replace("'", "''")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse→enrich→route→aggregate, per-sink counts."""
    result = pipeline.build(spark, SF0001)
    return pipeline.per_sink_counts(result)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _parsed(spark: SparkSession, sf_dir: str, mode: str = "native") -> DataFrame:
    turns = src.transcripts_df(spark, sf_dir)
    if mode == "arrow":
        return parsers.regex_parse_arrow(turns, PARSE_PATTERN_NAMED)
    return parsers.regex_parse(turns, PARSE_PATTERN, PARSE_GROUPS)


def q_parse_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _parsed(spark, sf_dir).select(
        "conv_id", "turn_idx", "parse_ok", "ts_raw", "level", "component", "msg"
    )


def q_parse_regex_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _parsed(spark, sf_dir, "arrow").select(
        "conv_id", "turn_idx", "parse_ok", "ts_raw", "level", "component", "msg"
    )


def q_parse_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """on_error=drop path: failed rows filtered out (counted in lineage)."""
    turns = src.transcripts_df(spark, sf_dir)
    df = parsers.regex_parse(turns, PARSE_PATTERN, PARSE_GROUPS, on_error="drop")
    return df.select("conv_id", "turn_idx", "level", "msg")


def q_kv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _parsed(spark, sf_dir)
    df = parsers.key_value_parse(df, parse_from="msg", out="kv")
    return df.select(
        "conv_id",
        "turn_idx",
        F.element_at("kv", "user").alias("kv_user"),
        F.element_at("kv", "items").alias("kv_items"),
    )


#: custom severity mapping exercised by q_severity: an HTTP-status-like
#: code column mapped through ranges + "Nxx" specials
#: (helper/severity_builder.go:113-165)
_SEV_MAPPING = {
    "info": ["2xx"],
    "warn3": [{"min": 300, "max": 399}],
    "error": ["4xx"],
    "fatal": ["5xx"],
}


def q_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = parsers.severity_parse(_parsed(spark, sf_dir), parse_from="level")
    # user-defined mapping path: code in 200..599 resolved through the
    # custom ranges, with overwrite_text yielding the canonical name
    df = df.withColumn("code", ((F.col("turn_idx") % 400) + 200).cast("string"))
    df = parsers.severity_parse(
        df.withColumnRenamed("severity_num", "_sn")
        .withColumnRenamed("severity_text", "_st"),
        parse_from="code",
        mapping=_SEV_MAPPING,
        overwrite_text=True,
    )
    return df.select(
        "conv_id",
        "turn_idx",
        F.col("_st").alias("severity_text"),
        F.col("_sn").alias("severity_num"),
        F.col("severity_num").alias("custom_num"),
        F.col("severity_text").alias("custom_text"),
    )


def q_time_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strptime + gotime + epoch layouts in one stage
    (operator/helper/time.go:19-26)."""
    df = parsers.time_parse(_parsed(spark, sf_dir), parse_from="ts_raw")
    df = parsers.time_parse(
        df, parse_from="ts_raw", layout="2006-01-02T15:04:05Z",
        layout_type="gotime", out="gotime_ts",
    )
    df = df.withColumn("epoch_ms", F.unix_millis(F.col("ts").cast("timestamp")))
    df = parsers.time_parse(
        df, parse_from="epoch_ms", layout="ms", layout_type="epoch", out="epoch_ts"
    )
    return df.select("conv_id", "turn_idx", "event_ts", "gotime_ts", "epoch_ts")


def q_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast enrich + insert-if-absent in one pass: env is pre-set
    for system rows and must WIN over the dimension value
    (k8sattributesprocessor/processor.go:189-194)."""
    df = _parsed(spark, sf_dir)
    df = df.withColumn(
        "env", F.when(F.col("role") == "system", F.lit("forced-env"))
    )
    df = processors.enrich_lookup(df, src.conv_dim_df(spark, sf_dir), on="conv_id")
    df = processors.enrich_lookup(df, src.tool_dim_df(spark), on="tool")
    return df.select(
        "conv_id", "turn_idx", "team", "env", "region", "tool_family", "risk_tier"
    )



def q_route_per_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    result = pipeline.build(spark, sf_dir)
    return pipeline.per_sink_counts(result)


def q_routed_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routed-row set equality incl. per-turn text — the north-rule check."""
    result = pipeline.build(spark, sf_dir)
    routed = connectors.routed_union(result.tagged, result.sink_map)
    return routed.select("sink", "conv_id", "turn_idx", "text")


def q_count_multi_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countconnector FULL config shape: one block emits N named metrics,
    each with own conditions/attributes/default_value, in ONE pass over
    the stream (connector/countconnector/config.go:35-51, counter.go:38-128).
    Covers the round-1/2 single-metric queries as metrics #1 and #2:
    missing-attr exclusion (counter.go:71-73) and default_value
    substitution (config.go:186-190); metric #3 exercises an OTTL
    condition string compiled by the connector itself; metric #4 (the
    former ``errors_per_team`` query, folded in round 4 to free a board
    slot) is a conditional count over a parse+enrich upstream, proving
    the one-pass block composes with derived attributes. All four
    metrics still share ONE scan + ONE shuffle (grouping sets)."""
    df = _parsed(spark, sf_dir)
    df = processors.enrich_lookup(df, src.conv_dim_df(spark, sf_dir), on="conv_id")
    out = connectors.count_connector_multi(
        df,
        {
            "turns.by_tool_role": connectors.MetricSpec(attrs=["tool", "role"]),
            "turns.by_tool_role_default": connectors.MetricSpec(
                attrs=["tool", "role"], defaults={"tool": "none"}
            ),
            "assistant.turns": connectors.MetricSpec(
                attrs=["role"], conditions=['role == "assistant"']
            ),
            "errors.per_team": connectors.MetricSpec(
                attrs=["team"], conditions=['level == "ERROR"']
            ),
        },
    )
    return out.select("metric", "tool", "role", "team", F.col("value").alias("n"))


def q_groupbyattrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupbyattrsprocessor (processor/groupbyattrsprocessor/processor.go:
    63-100): regroup records under a new identity keyed by an attribute.
    Spark-first analog = repartition on the keys; this query proves the
    stage preserves content (per-turn text equality) AND that the
    regrouped identity is consistent — group_size counted per key AFTER
    the stage equals the key's true cardinality."""
    df = _parsed(spark, sf_dir)
    g = processors.group_by_attrs(df, ["tool"])
    w = Window.partitionBy("tool")
    return g.select(
        "conv_id",
        "turn_idx",
        "tool",
        F.count(F.lit(1)).over(w).alias("group_size"),
        "text",
    )


def q_sum_items_by_team(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sumconnector (sumconnector/config.go:33-44)."""
    df = _parsed(spark, sf_dir)
    df = parsers.key_value_parse(df, parse_from="msg", out="kv")
    df = processors.enrich_lookup(df, src.conv_dim_df(spark, sf_dir), on="conv_id")
    return connectors.sum_connector(
        df.filter(F.col("parse_ok")),
        F.element_at("kv", "items").cast("long"),
        ["team"],
        name="sum_items",
    )


def q_log_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logdedup processor, BOTH config shapes in one board row (round-4
    slot merge): collapse dup (role, level, tool) rows, and the
    exclude_fields variant (processor/logdedupprocessor) where the
    excluded key must not split groups. Variant-tagged union."""
    df = _parsed(spark, sf_dir)
    full = processors.log_dedup(df, ["role", "level", "tool"], ts_col="ts")
    excl = processors.log_dedup(
        df, ["role", "level", "tool"], ts_col="ts", exclude=["tool"]
    ).withColumn("tool", F.lit(None).cast("string"))
    return full.withColumn("variant", F.lit("full")).unionByName(
        excl.withColumn("variant", F.lit("exclude_tool"))
    )


def q_filter_transformer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter transformer drops matching rows (transformer/filter)."""
    turns = src.transcripts_df(spark, sf_dir)
    out = transformers.filter_drop(turns, F.col("role") == "system")
    return out.select("conv_id", "turn_idx", "role")


def q_recombine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recombine transformer: merge turns into blocks ending at every
    5th turn (is_last_entry semantics, recombine/transformer.go:130-151)."""
    turns = src.transcripts_df(spark, sf_dir)
    out = transformers.recombine(
        turns,
        is_last=(F.col("turn_idx") % 5 == 4),
        combine_with="\n",
    )
    return out.select("conv_id", "turn_idx", "text", "n_combined")


def q_attributes_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """attributesprocessor action list: UPSERT + HASH + EXTRACT + CONVERT
    (internal/coreinternal/attraction/attraction.go:287-342)."""
    df = _parsed(spark, sf_dir)
    df = processors.attr_upsert(df, "pipeline", "logs")
    df = processors.attr_hash(df.withColumn("conv_hash", F.col("conv_id")), "conv_hash")
    df = processors.attr_extract(df, "component", r"^svc-(\d+)$", ["svc_num"])
    df = processors.attr_convert(df, "svc_num", "int")
    return df.select("conv_id", "turn_idx", "pipeline", "conv_hash", "svc_num")


def q_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """redactionprocessor: allowed-key column drop + blocked-value
    masking + summary attributes (processor.go:193+,320-340) in one
    projection."""
    turns = src.transcripts_df(spark, sf_dir)
    out = processors.redact(
        turns,
        allowed_keys=["conv_id", "turn_idx", "role", "text"],
        mask_patterns={"user_ids": r"user=\d+"},
        mask_cols=["text"],
        summary="debug",
    )
    return out.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("text").alias("redacted"),
        F.col("`redaction.masked.count`").alias("masked_count"),
        F.col("`redaction.masked.keys`").alias("masked_keys"),
        F.col("`redaction.redacted.count`").alias("redacted_count"),
        F.col("`redaction.redacted.keys`").alias("redacted_keys"),
    )


# ---------------------------------------------------------------------------
# wider parser / transformer / processor coverage. Inputs the transcripts
# table lacks (syslog lines, container logs, JSON, CSV, URIs) are
# synthesized IN the query from transcript columns via portable
# constructions both engines mirror — the operator under test is the
# parser, not the generator.
# ---------------------------------------------------------------------------

_SYSLOG_LINE = (
    "'<' || cast(turn_idx % 192 AS string) || '>1 2024-01-01T12:30:0' "
    "|| cast(turn_idx % 10 AS string) || 'Z host' "
    "|| cast(turn_idx % 5 AS string) || ' app-' || role || ' ' "
    "|| cast(turn_idx AS string) || ' m1 - ' || text"
)


def q_syslog_rfc5424(spark: SparkSession, sf_dir: str) -> DataFrame:
    turns = src.transcripts_df(spark, sf_dir)
    lines = turns.select(
        "conv_id", "turn_idx", F.expr(_SYSLOG_LINE).alias("text")
    )
    out = parsers.syslog_parse(lines, protocol="rfc5424")
    return out.select(
        "conv_id", "turn_idx", "parse_ok", "hostname", "appname",
        "facility", "severity", "message",
    )


_CRI_LINE = (
    "'2024-01-01T00:00:0' || cast(turn_idx % 10 AS string) || 'Z ' "
    "|| (CASE WHEN turn_idx % 2 = 0 THEN 'stdout' ELSE 'stderr' END) "
    "|| ' ' || (CASE WHEN turn_idx % 3 = 2 THEN 'F' ELSE 'P' END) "
    "|| ' seg-' || cast(turn_idx AS string) || '-' || role"
)
_DOCKER_LINE = (
    "'{\"log\":\"line-' || cast(turn_idx AS string) || '-' || role "
    "|| '\",\"stream\":\"stdout\",\"time\":\"2024-01-01T00:00:00Z\"}'"
)
_CONTAINER_LINE = (
    f"CASE WHEN turn_idx % 2 = 0 THEN {_DOCKER_LINE} ELSE {_CRI_LINE} END"
)


def q_container_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    turns = src.transcripts_df(spark, sf_dir)
    lines = turns.select(
        "conv_id", "turn_idx", F.expr(_CONTAINER_LINE).alias("text")
    )
    out = parsers.container_parse(lines)
    return out.select(
        "conv_id", "turn_idx", "container_format", "container_time",
        "stream", "logtag", "log",
    )


def q_container_recombine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRI partial-line merge: P segments concatenate into the next F
    (operator/parser/container/config.go:63-68,84-89)."""
    turns = src.transcripts_df(spark, sf_dir)
    lines = turns.select(
        "conv_id", "turn_idx", F.expr(_CRI_LINE).alias("text")
    )
    out = parsers.container_parse(lines, recombine_partials=True)
    return out.select("conv_id", "turn_idx", "log", "n_combined")


GROK_QUERY_PATTERN = (
    "%{TIMESTAMP_ISO8601:g_ts} %{LOGLEVEL:g_level} "
    "svc-%{INT:g_svc}: %{GREEDYDATA:g_rest}"
)

# SQL-embedded mirrors of the parser regexes (shared strings => zero drift)
from opentelemetry_collector_contrib_spark.operators import grok as _grokmod  # noqa: E402
from opentelemetry_collector_contrib_spark.operators.parsers import (  # noqa: E402
    _CRI_PATTERN as _CRI_SQL,
    _RFC5424 as _RFC5424_SQL,
)

_GROK_SQL = _grokmod.grok_to_regex(GROK_QUERY_PATTERN)


def q_grok_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opentelemetry_collector_contrib_spark.operators import grok

    turns = src.transcripts_df(spark, sf_dir)
    out = grok.grok_parse(turns, GROK_QUERY_PATTERN)
    return out.select(
        "conv_id", "turn_idx", "parse_ok", "g_ts", "g_level", "g_svc", "g_rest"
    )


_JSON_LINE = (
    "'{\"a\":' || cast(turn_idx AS string) || ',\"b\":\"' || role || '\"}'"
)


# three CSV shapes: quoted field with embedded delimiter (the case a
# bare split mis-parses, operator/parser/csv/parser_test.go), a valid
# trailing empty field, and a short row (Go csv.Reader errors -> on_error)
_CSV_LINE = (
    "CASE WHEN turn_idx % 7 = 0 THEN role "
    "WHEN turn_idx % 7 = 3 THEN role || ',\"' || tool || ',q\",' "
    "ELSE role || ',\"' || tool || ',q\",' || cast(turn_idx AS string) END"
)

_URI_LINE = (
    "'https://host' || cast(turn_idx % 3 AS string) "
    "|| '.example.com/path/' || role || '?q=' || cast(turn_idx AS string)"
)


def q_structured_parse_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_parser + csv_parser + uri_parser in ONE scan (each was a
    standalone board row through round 4; FOLDED here round 5 to free
    two driver slots for decontamination/semdedup). Each parser reads
    its own derived line column via ``parse_from``, so the composite
    still exercises the exact per-parser semantics (quoted CSV fields,
    short-row on_error, typed JSON extraction, parse_url splitting) —
    operator/parser/{json,csv,uri}/parser.go."""
    turns = src.transcripts_df(spark, sf_dir)
    lines = turns.select(
        "conv_id",
        "turn_idx",
        F.expr(_JSON_LINE).alias("jline"),
        F.expr(_CSV_LINE).alias("cline"),
        F.expr(_URI_LINE).alias("uri"),
    )
    out = parsers.json_parse(lines, "a long, b string", parse_from="jline")
    out = out.withColumnRenamed("parse_ok", "json_ok")
    out = parsers.csv_parse(out, ["c_role", "c_tool", "c_idx"], parse_from="cline")
    out = out.withColumnRenamed("parse_ok", "csv_ok")
    out = parsers.uri_parse(out)
    return out.select(
        "conv_id", "turn_idx",
        "json_ok", "a", "b",
        "csv_ok", "c_role", "c_tool", "c_idx",
        "scheme", "host", "path", "query",
    )



def q_transformer_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add/copy/move/unquote/regex_replace/assign_keys in one chain
    (stanza transformer family, SURVEY.md §2.3). assign_keys
    (transformer/assignkeys/transformer.go:30 — zip a list with key
    names into a map) was a standalone board row through round 4; it is
    FOLDED here (v_role/v_tool below) to free a driver slot."""
    turns = src.transcripts_df(spark, sf_dir)
    out = transformers.add(turns, "pipeline", "logs")
    out = transformers.add(
        out, "env_kind", F.lit("sys"), if_cond=F.col("role") == "system"
    )
    out = transformers.copy(out, "conv_id", "conv_copy")
    out = transformers.move(out, "role", "actor")
    out = out.withColumn("quoted_tool", F.concat(F.lit('"'), F.col("tool"), F.lit('"')))
    out = transformers.unquote(out, "quoted_tool")
    out = transformers.regex_replace(out, "text", r"\d", "#")
    out = out.withColumn("vals", F.array("actor", "tool"))
    out = transformers.assign_keys(out, "vals", ["k_role", "k_tool"], "m")
    return out.select(
        "conv_id", "turn_idx", "pipeline", "env_kind", "conv_copy",
        "actor", "quoted_tool", F.col("text").alias("masked"),
        F.element_at("m", "k_role").alias("v_role"),
        F.element_at("m", "k_tool").alias("v_tool"),
    )


def q_attr_insert_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """attributesprocessor INSERT/UPDATE/DELETE actions
    (attraction.go:287-311)."""
    turns = src.transcripts_df(spark, sf_dir)
    df = turns.withColumn(
        "env", F.when(F.col("role") == "system", F.lit("pre-set"))
    )
    df = processors.attr_insert(df, "env", "inserted")        # only where null
    df = processors.attr_update(df, "env", F.upper(F.col("env")))  # only where set
    df = processors.attr_insert(df, "note", "fresh")           # absent -> created
    df = processors.attr_delete(df, "tool")
    assert "tool" not in df.columns
    return df.select("conv_id", "turn_idx", "env", "note")


def q_filter_processor_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filterprocessor: drop rows matching ANY OTTL condition (OR'd,
    processor/filterprocessor/logs.go:68-99)."""
    turns = src.transcripts_df(spark, sf_dir)
    out = processors.filter_logs(
        turns,
        F.col("role") == "system",
        F.col("tool") == "bash",
    )
    return out.select("conv_id", "turn_idx", "role", "tool")


_OTLP_LINE = (
    "'{\"body\":\"' || role || '\",\"severityText\":\"INFO\",'"
    " || '\"attributes\":{\"tool\":\"' || tool || '\"}}'"
)


def q_otlpjson_connector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """otlpjson connector (connector/otlpjsonconnector/): logs-as-OTLP-JSON
    -> parsed records via from_json with explicit schema."""
    turns = src.transcripts_df(spark, sf_dir)
    lines = turns.select("conv_id", "turn_idx", F.expr(_OTLP_LINE).alias("text"))
    schema = "body string, severityText string, attributes struct<tool: string>"
    out = parsers.json_parse(lines, schema)
    return out.select(
        "conv_id", "turn_idx", "body", "severityText",
        F.col("attributes.tool").alias("attr_tool"),
    )


_JSONARR_LINE = "'[\"' || role || '\",\"' || tool || '\"]'"


def q_jsonarray_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonarray_parser (operator/parser/jsonarray/): JSON array string ->
    slice -> element access."""
    turns = src.transcripts_df(spark, sf_dir)
    lines = turns.select("conv_id", "turn_idx", F.expr(_JSONARR_LINE).alias("text"))
    arr = F.from_json(F.col("text"), "array<string>")
    return lines.select(
        "conv_id", "turn_idx",
        F.element_at(arr, 1).alias("e1"), F.element_at(arr, 2).alias("e2"),
    )


def q_flatten_retain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatten + retain transformers (transformer/{flatten,retain})."""
    turns = src.transcripts_df(spark, sf_dir)
    nested = turns.select(
        "conv_id", "turn_idx", F.struct("role", "tool").alias("nested")
    )
    flat = transformers.flatten(nested, "nested")
    return transformers.retain(flat, ["conv_id", "turn_idx", "role", "tool"])





def q_resource_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resourcedetectionprocessor with the REAL `system` detector: the
    environment is probed once on the driver (hostname cascade, os.type
    enum, semconv arch) and stamped with override=false semantics; the
    oracle interpolates the same probe, so the row verifies the actual
    detected values, not config literals."""
    det = processors.detect_system()
    turns = src.transcripts_df(spark, sf_dir)
    df = turns.withColumn(
        "host_name", F.when(F.col("role") == "system", F.lit("pinned-host"))
    )
    df = processors.resource_detect(
        df,
        {
            "os_type": det["os.type"],
            "cloud_provider": "none",
            "host_name": det["host.name"],
            "host_arch": det["host.arch"],
        },
    )
    return df.select(
        "conv_id", "turn_idx", "os_type", "cloud_provider", "host_name", "host_arch"
    )


def q_conv_text_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn text equality under stable turn ordering (north_rule
    invariant): order-insensitive-to-shuffle per-conv digest, in BOTH
    forms — flat and hierarchical (block-parallel, the hot-conversation-
    proof variant; block=8 so sf0.001 convs span several blocks)."""
    from opentelemetry_collector_contrib_spark.plans import ordering

    turns = src.transcripts_df(spark, sf_dir)
    flat = ordering.conv_text_digest(turns)
    hier = ordering.conv_text_digest_hier(turns, block=8).select(
        "conv_id", F.col("digest").alias("digest_hier")
    )
    return flat.join(hier, "conv_id")


def q_salted_count_by_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation == plain groupBy (skew hardening)."""
    from opentelemetry_collector_contrib_spark.plans import ordering

    turns = src.transcripts_df(spark, sf_dir)
    return ordering.salted_count(turns, ["role"], n_salt=16)


def q_ottl_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformprocessor statement sequence compiled to Column ops
    (processor/transformprocessor/config.go:40-46; pkg/ottl grammar)."""
    from opentelemetry_collector_contrib_spark.operators import ottl

    turns = src.transcripts_df(spark, sf_dir)
    out = ottl.apply_statements(
        turns,
        [
            "set(pipeline, 'logs')",
            "set(norm_role, ToUpperCase(role))",
            "replace_pattern(body, 'user=[0-9]+', 'user=****')",
            "set(conv_hash, SHA256(conv_id)) where role == 'assistant'",
        ],
    )
    return out.select(
        "conv_id",
        "turn_idx",
        "pipeline",
        "norm_role",
        F.col("text").alias("redacted"),
        "conv_hash",
    )


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings corpora)
# ---------------------------------------------------------------------------

from opentelemetry_collector_contrib_spark.functions import (  # noqa: E402
    decontam as dc,
    dedup as dd,
    multimodal as mm,
    similarity as sim,
    text as tx,
    weighting as wt,
)
from opentelemetry_collector_contrib_spark.sources import documents as docsrc  # noqa: E402

MINHASH_K, LSH_BANDS, SHINGLE_W = 12, 4, 3
ANN_K, ANN_PLANES, ANN_QUERY_MAX = 5, 8, 8


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup(docsrc.documents_df(spark, sf_dir))


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = docsrc.documents_df(spark, sf_dir)
    # distinct=False: minhash's per-permutation MIN is duplicate-
    # insensitive, so the dedup shuffle is skipped
    sh = dd.shingles(docs, w=SHINGLE_W, distinct=False)
    sigs = dd.minhash_signatures(sh, k=MINHASH_K)
    return dd.lsh_pairs(sigs, k=MINHASH_K, bands=LSH_BANDS)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash(docsrc.documents_df(spark, sf_dir))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = dd.shingles(docsrc.documents_df(spark, sf_dir), w=SHINGLE_W)
    return dd.jaccard_topk_pairs(sh, topk=20)


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH-only (the driver board is capped at 50 slots): C4 three-
    sentence-span dedup (Raffel et al. 2020 §2.2) rewriting documents.
    Oracle parity is pytest-enforced against an equivalent DuckDB query
    (tests/test_training_data_ops.py::test_span_dedup_matches_duckdb_oracle)
    with the same compare harness the driver uses."""
    return dd.span_dedup(docsrc.documents_df(spark, sf_dir))


def q_corpus_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH-only: the FULL declarative training-data recipe as one
    config-compiled job — PII scrub -> Gopher gates -> exact dedup ->
    minhash near-dup with connected-components survivors ->
    benchmark decontamination -> DSIR target selection -> deterministic
    global shuffle -> sequence packing. Every stage is individually
    oracle- or pytest-checked; this entry times their composition (the
    number a 100 TB corpus-prep deployment actually cares about)."""
    from opentelemetry_collector_contrib_spark.plans import config_pipeline

    docs = docsrc.documents_df(spark, sf_dir)
    cfg = {
        "processors": [
            {"type": "pii_scrub"},
            {"type": "gopher_gates", "min_words": 5, "max_symbol_word_ratio": 0.3},
            {"type": "dedup_exact"},
            # boundary: everything downstream is multi-pass (components
            # iteration, decontamination probe, DSIR's two scans) — cut
            # the lineage once so passes re-read a materialized frame
            {"type": "checkpoint"},
            {"type": "dedup_minhash", "components": True},
            {"type": "checkpoint"},
            {"type": "decontaminate", "eval_where": "doc_id % 17 = 0", "n": 3},
            # dsir_select re-reads its input 3+ times (corpus count,
            # target count, weight join + semi-join back) — cut the
            # lineage after the decontamination probe or each pass
            # re-runs the shingle explode + broadcast join
            {"type": "checkpoint"},
            {"type": "dsir_select", "target_where": "doc_id % 13 = 0",
             "k": 200, "seed": 5},
            {"type": "global_shuffle", "key": "doc_id", "seed": 5},
            {"type": "pack_sequences", "budget": 2048},
        ]
    }
    out, _sinks = config_pipeline.build_from_config(spark, sf_dir, cfg, source=docs)
    return out


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = docsrc.embeddings_df(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < ANN_QUERY_MAX)
    return sim.ann_bruteforce_topk(emb, queries_df, k=ANN_K)


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force + LSH-bucketed top-k in one board row, tagged by
    method (each was a standalone row through round 4; FOLDED round 5
    to free a slot for dsir_weights — both result sets stay fully
    oracle-checked via the tagged union)."""
    brute = q_ann_cosine_topk(spark, sf_dir).withColumn(
        "method", F.lit("brute")
    )
    lsh = q_ann_lsh_topk(spark, sf_dir).withColumn("method", F.lit("lsh"))
    return brute.unionByName(lsh)


CORPUS_MIN_QUALITY = 0.5
CORPUS_KEEP_LANG = "en"


CORPUS_MIN_WORDS = 30


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-corpus prep: quality gate -> language gate ->
    Gopher document gates (word-count bounds, symbol-to-word ratio,
    bullet/ellipsis line fractions, alpha-word fraction; Rae et al.
    §A1.1) -> exact dedup -> minhash-LSH near-dup removal — driven
    through the declarative config pipeline (plans/config_pipeline.py),
    the way a collector user would compose it."""
    from opentelemetry_collector_contrib_spark.plans import config_pipeline

    cfg = {
        "processors": [
            {"type": "quality_gate", "min_quality": CORPUS_MIN_QUALITY},
            {"type": "lang_gate", "keep_lang": CORPUS_KEEP_LANG},
            {"type": "gopher_gates", "min_words": CORPUS_MIN_WORDS},
            {"type": "dedup_exact"},
            {"type": "dedup_minhash", "shingle_w": SHINGLE_W,
             "minhash_k": MINHASH_K, "lsh_bands": LSH_BANDS},
        ]
    }
    docs = docsrc.documents_df(spark, sf_dir)
    out, _ = config_pipeline.build_from_config(spark, sf_dir, cfg, source=docs)
    return out.select("doc_id", "lang", "n_chars", "quality")


def _corpus_oracle_sql() -> str:
    quality = _QUALITY_EXPRS.format(h_en=_HITS["en"].replace("(t,", "(tk.t,"))
    hits_cols = ", ".join(f"{_HITS[l]} AS h_{l}" for l in tx.STOPWORDS)
    sig_cols = ", ".join(
        f"min(md5('{i}:' || shingle)) AS sig_{i}" for i in range(MINHASH_K)
    )
    banded = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5({_PIPE_SEP.join(f'sig_{b * _R + j}' for j in range(_R))}) AS bh "
        "FROM sig2"
        for b in range(LSH_BANDS)
    )
    return f"""
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
{quality.strip().rstrip()},
quality_q AS (SELECT doc_id,
  0.25*length_ok + 0.25*alpha_ratio + 0.25*stop_sig + 0.25*word_len_ok AS quality
  FROM comp),
hits AS (SELECT d.doc_id, {hits_cols}
         FROM documents d JOIN toks tk ON d.doc_id = tk.doc_id),
langed AS (SELECT doc_id, {_LANG_CASE} AS pred_lang FROM hits),
gop AS (SELECT d.doc_id,
          len(tk.t) AS nw,
          cast(len(regexp_extract_all(d.text, '#|\\.\\.\\.|…')) AS double)
            / greatest(len(tk.t), 1) AS sym_ratio,
          cast(len(list_filter(list_filter(string_split(d.text, chr(10)),
                 x -> trim(x) <> ''), x -> regexp_matches(trim(x), '^[-*•‣▪]')))
            AS double)
            / greatest(len(list_filter(string_split(d.text, chr(10)),
                 x -> trim(x) <> '')), 1) AS bullet_frac,
          cast(len(list_filter(list_filter(string_split(d.text, chr(10)),
                 x -> trim(x) <> ''),
                 x -> regexp_matches(rtrim(x), '(\\.\\.\\.|…)$'))) AS double)
            / greatest(len(list_filter(string_split(d.text, chr(10)),
                 x -> trim(x) <> '')), 1) AS ell_frac,
          cast(len(list_filter(tk.t, x -> regexp_matches(x, '[a-z]')))
            AS double) / greatest(len(tk.t), 1) AS alpha_w_frac
        FROM documents d JOIN toks tk ON d.doc_id = tk.doc_id),
gated AS (SELECT d.doc_id, d.lang, d.n_chars, d.text, q.quality
          FROM documents d
          JOIN quality_q q ON d.doc_id = q.doc_id
          JOIN langed l ON d.doc_id = l.doc_id
          JOIN gop g ON d.doc_id = g.doc_id
          WHERE q.quality >= {CORPUS_MIN_QUALITY}
            AND l.pred_lang = '{CORPUS_KEEP_LANG}'
            AND g.nw BETWEEN {CORPUS_MIN_WORDS} AND 100000
            AND g.sym_ratio <= 0.1
            AND g.bullet_frac <= 0.9
            AND g.ell_frac <= 0.3
            AND g.alpha_w_frac >= 0.8),
hashed AS (SELECT *, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS h
           FROM gated),
keepx AS (SELECT h, min(doc_id) AS doc_id FROM hashed GROUP BY h),
exact AS (SELECT hashed.* FROM hashed JOIN keepx USING (h, doc_id)),
toks2 AS (SELECT e.doc_id, regexp_extract_all(lower(e.text), '[a-z0-9]+') AS t
          FROM exact e),
sh2 AS (SELECT doc_id, shingle FROM (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(t) - {SHINGLE_W - 1}, 1)),
            i -> array_to_string(t[i:i+{SHINGLE_W - 1}], ' '))) AS shingle
          FROM toks2) WHERE shingle <> ''),
sig2 AS (SELECT doc_id, {sig_cols} FROM sh2 GROUP BY doc_id),
banded2 AS ({banded}),
capped2 AS (SELECT * FROM banded2
            QUALIFY row_number() OVER (PARTITION BY band, bh ORDER BY doc_id)
            <= 1000),
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM capped2 a JOIN capped2 b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
drops AS (SELECT DISTINCT doc_b FROM pairs)
SELECT e.doc_id, e.lang, e.n_chars, e.quality
FROM exact e LEFT JOIN drops p ON e.doc_id = p.doc_b
WHERE p.doc_b IS NULL
"""


def _repetition_oracle_sql() -> str:
    """DuckDB re-implementation of functions/text.py repetition_signals:
    same term families (word {2,3,4,5,10}-grams + non-blank lines, n=0
    marks lines), same per-(doc, n) rollup (top cover by (count, len)
    lexicographic max — Spark's max(struct)), same character-weighted
    Gopher fractions, zero rows preserved via the distinct-ids left
    join. The Spark side shuffles xxhash64(term) ids; the oracle counts
    the term strings themselves — identical counts absent a 64-bit
    collision (odds ~1e-7 at sf0.01)."""
    gram_selects = []
    for n in (2, 3, 4, 5, 10):
        gram_selects.append(
            f"SELECT doc_id, {n} AS n, unnest(list_transform("
            f"generate_series(1, len(t) - {n - 1}), "
            f"i -> array_to_string(t[i:i+{n - 1}], ' '))) AS term "
            f"FROM toks WHERE len(t) >= {n}"
        )
    gram_selects.append(
        "SELECT doc_id, 0 AS n, unnest(list_filter("
        "string_split(text, chr(10)), x -> trim(x) <> '')) AS term "
        "FROM documents"
    )
    terms = " UNION ALL ".join(gram_selects)
    return f"""
WITH {_TOKS_CTE},
terms AS ({terms}),
counted AS (SELECT doc_id, n, term, count(*) AS c, length(term) AS len
            FROM terms GROUP BY doc_id, n, term),
per_n AS (SELECT doc_id, n,
            sum(c * len) AS tot_chars,
            sum(CASE WHEN c > 1 THEN c * len ELSE 0 END) AS dup_chars,
            sum(c) AS n_terms,
            sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_terms
          FROM counted GROUP BY doc_id, n),
ranked AS (SELECT doc_id, n, c * len AS cover,
             row_number() OVER (PARTITION BY doc_id, n
                                ORDER BY c DESC, len DESC) AS rn
           FROM counted),
mets AS (SELECT p.doc_id, p.n,
           cast(t.cover AS double) / greatest(p.tot_chars, 1) AS top_frac,
           cast(p.dup_chars AS double) / greatest(p.tot_chars, 1) AS dup_frac,
           cast(p.dup_terms AS double) / greatest(p.n_terms, 1) AS dup_term_frac
         FROM per_n p JOIN (SELECT * FROM ranked WHERE rn = 1) t
         ON p.doc_id = t.doc_id AND p.n = t.n)
SELECT d.doc_id,
  coalesce(max(CASE WHEN n = 2 THEN top_frac END), 0.0) AS top2gram_char_frac,
  coalesce(max(CASE WHEN n = 3 THEN top_frac END), 0.0) AS top3gram_char_frac,
  coalesce(max(CASE WHEN n = 4 THEN top_frac END), 0.0) AS top4gram_char_frac,
  coalesce(max(CASE WHEN n = 5 THEN dup_frac END), 0.0) AS dup5gram_char_frac,
  coalesce(max(CASE WHEN n = 10 THEN dup_frac END), 0.0) AS dup10gram_char_frac,
  coalesce(max(CASE WHEN n = 0 THEN dup_term_frac END), 0.0) AS dup_line_frac,
  coalesce(max(CASE WHEN n = 0 THEN dup_frac END), 0.0) AS dup_line_char_frac
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN mets m ON d.doc_id = m.doc_id
GROUP BY d.doc_id
"""


def q_dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-blocked, global top-20."""
    emb = docsrc.embeddings_df(spark, sf_dir)
    return sim.near_dup_pairs(emb, planes=ANN_PLANES, topk=20)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = docsrc.embeddings_df(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < ANN_QUERY_MAX)
    return sim.ann_lsh_topk(emb, queries_df, k=ANN_K, planes=ANN_PLANES)







def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = mm.attach_fake_payload(docsrc.documents_df(spark, sf_dir))
    feats = mm.decode_features(docs, impl="fake")
    return feats.select("doc_id", "kind", "n_bytes", "frame_count")


def q_ann_ivf_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench twin at honest ANN settings (nprobe < nlist): IVF-flat ANN
    over the embeddings table."""
    emb = docsrc.embeddings_df(spark, sf_dir)
    return sim.ann_ivf_topk(emb, emb.limit(8), k=5, nlist=16, nprobe=4, iters=1)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN driver row, run at nprobe == nlist (full probe):
    every query probes every inverted list, so the candidate set is the
    whole corpus and the result is EXACTLY brute-force kNN — which makes
    the full IVF machinery (deterministic k-means quantizer, Arrow
    matmul assignment, cell-id broadcast join, bounded top-k)
    SQL-replayable: the oracle is the same query brute force uses.
    Recall at nprobe < nlist is covered by pytest
    (tests/test_similarity.py)."""
    emb = docsrc.embeddings_df(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < ANN_QUERY_MAX)
    return sim.ann_ivf_topk(
        emb, queries_df, k=ANN_K, nlist=16, nprobe=16, iters=1
    )


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition metrics (Rae et al. 2021 §A1.1) over the
    documents table — dup-line fractions + top/dup n-gram character
    fractions, one scan + one explode (functions/text.py)."""
    return tx.repetition_signals(docsrc.documents_df(spark, sf_dir))


#: every 17th document plays the held-out benchmark set for the
#: decontamination driver row (30/500 docs at sf0.01 — deterministic,
#: no external data per the brief)
DECON_EVAL_MOD = 17

#: semdedup threshold chosen in a wide empirical gap of the within-
#: bucket cosine distribution at BOTH test SFs (nearest pair sim is
#: >0.003 away at sf0.001 and sf0.01), so float32-vs-float64 rounding
#: between Spark and the DuckDB oracle cannot flip a pair across it
SEMDEDUP_THRESHOLD = 0.28


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C recipe) — per-doc
    n-gram collision counts against a broadcast eval set
    (functions/decontam.py). Eval side = every 17th document; n =
    SHINGLE_W so the oracle reuses the shared shingle CTE and the whole
    dedup family agrees on one n-gram definition."""
    docs = docsrc.documents_df(spark, sf_dir)
    eval_docs = docs.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
    return dc.contamination_report(docs, eval_docs, n=SHINGLE_W)


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) with the deterministic id-dominance
    keep rule (functions/similarity.py:semdedup). Clustered on the
    seed-free LSH sign bucket so the blocking is SQL-replayable; the
    IVF-quantizer clustering path is covered by pytest."""
    emb = docsrc.embeddings_df(spark, sf_dir)
    kept = sim.semdedup(
        emb,
        cluster=sim.lsh_bucket("embedding", planes=ANN_PLANES),
        threshold=SEMDEDUP_THRESHOLD,
    )
    return kept.select("vec_id", "cell")


#: every 13th document plays the high-quality target distribution for
#: the DSIR driver row (deterministic slice, disjoint modulus from the
#: decontamination eval slice so the two rows stress different subsets)
DSIR_TARGET_MOD = 13


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) of the documents
    corpus against a deterministic target slice
    (functions/weighting.py). The md5-prefix bucketing makes the whole
    hashed-n-gram likelihood-ratio model SQL-replayable; the Gumbel
    resampling step is seeded-hash deterministic and covered by
    pytest (not SQL-expressible, same split as sample_invariants)."""
    docs = docsrc.documents_df(spark, sf_dir)
    target = docs.filter(F.col("doc_id") % DSIR_TARGET_MOD == 0)
    return wt.dsir_logweights(docs, target)


SAMPLE_K, SAMPLE_FRAC, PACK_BUDGET, PACK_SHARDS = 30, 0.2, 64, 8


def q_sample_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling + global shuffle (functions/sampling.py),
    oracle-checked via invariants: the hash-ordered selections cannot be
    replayed in SQL (DuckDB has no xxhash64), but per-stratum exact
    counts, membership ⊂ input, seed-stability (same seed → same rows),
    and shuffle order-stability (output order == seeded hash order) are
    all exactly predictable. Epoch-scale ops a training pipeline runs
    every run; deterministic under task retries by construction."""
    from opentelemetry_collector_contrib_spark.functions import sampling as sp

    docs = docsrc.documents_df(spark, sf_dir).select("doc_id", "lang")
    base = docs.groupBy("lang").agg(F.count("*").alias("_n"))

    def _per_lang(sample: DataFrame, tag: str) -> DataFrame:
        return sample.groupBy("lang").agg(F.count("*").alias(f"n_{tag}"))

    # stratified exact-k: twice with the same seed (stability) + member
    ex1 = sp.stratified_sample(docs, "lang", k=SAMPLE_K, key="doc_id", seed=7)
    ex2 = sp.stratified_sample(docs, "lang", k=SAMPLE_K, key="doc_id", seed=7)
    ex_stable = _per_lang(
        ex1.join(ex2, ["doc_id", "lang"]), "ex_stable"
    )
    ex_member = _per_lang(ex1.join(docs, ["doc_id", "lang"]), "ex_member")
    # stratified fractions: zero-shuffle hash-threshold filter
    fr1 = sp.stratified_sample(
        docs, "lang", fractions={
            r["lang"]: SAMPLE_FRAC for r in base.select("lang").collect()
        }, key="doc_id", seed=11,
    )
    fr2 = sp.stratified_sample(
        docs, "lang", fractions={
            r["lang"]: SAMPLE_FRAC for r in base.select("lang").collect()
        }, key="doc_id", seed=11,
    )
    fr_n = _per_lang(fr1, "fr")
    fr_stable = _per_lang(fr1.join(fr2, ["doc_id", "lang"]), "fr_stable")
    # global exact-k: membership + stability booleans folded per lang
    g1 = sp.exact_sample(docs, 100, key="doc_id", seed=13)
    g2 = sp.exact_sample(docs, 100, key="doc_id", seed=13)
    g_n = _per_lang(g1, "g")
    g_stable = _per_lang(g1.join(g2, ["doc_id", "lang"]), "g_stable")
    # the large-k scale path (hash pre-filter + range-partitioned exact
    # trim) must select the IDENTICAL sample as the TakeOrdered path
    g3 = sp.exact_sample(
        docs, 100, key="doc_id", seed=13, large_k=True, num_partitions=8
    )
    g_large = _per_lang(g1.join(g3, ["doc_id", "lang"]), "g_large")
    # global shuffle: output order must BE the seeded hash order —
    # ranks by physical output position (mono id follows the range
    # partitioning + in-partition sort) equal ranks by hash
    sh = sp.global_shuffle(docs, "doc_id", seed=17).withColumn(
        "_pos", F.monotonically_increasing_id()
    )
    h = F.xxhash64(F.col("doc_id"), F.lit(17))
    sh = sh.withColumn(
        "_ok",
        F.row_number().over(Window.orderBy("_pos"))
        == F.row_number().over(Window.orderBy(h)),
    )
    sh_ok = sh.groupBy("lang").agg(
        F.min(F.col("_ok").cast("int")).alias("_shuffle_min")
    )
    out = (
        base.join(ex_stable, "lang").join(ex_member, "lang")
        .join(fr_n, "lang").join(fr_stable, "lang")
        .join(g_n, "lang").join(g_stable, "lang").join(g_large, "lang")
        .join(sh_ok, "lang")
    )
    k = F.least(F.lit(SAMPLE_K), F.col("_n"))
    return out.select(
        "lang",
        k.cast("long").alias("n_exact"),
        (F.col("n_ex_member") == k).alias("exact_member"),
        (F.col("n_ex_stable") == k).alias("exact_stable"),
        # hash-threshold hit rate within a generous tolerance of the
        # requested fraction (exact value is hash-dependent, bound isn't)
        (
            F.abs(F.col("n_fr") / F.col("_n") - F.lit(SAMPLE_FRAC)) < 0.1
        ).alias("frac_tol_ok"),
        (F.col("n_fr_stable") == F.col("n_fr")).alias("frac_stable"),
        (F.col("n_g_stable") == F.col("n_g")).alias("gexact_stable"),
        (F.col("n_g_large") == F.col("n_g")).alias("glarge_eq"),
        (F.col("_shuffle_min") == 1).alias("shuffle_ordered"),
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (functions/packing.py): greedy next-fit binning
    into token budgets — the corpus→training-shards step. Oracle checks
    the packing invariants that hold for ANY shard hash: every doc lands
    in exactly one bin, token mass is conserved, no multi-doc bin
    exceeds the budget, every over-budget doc sits alone in its own bin
    (never dropped), and bin count ≥ the ceil(total/budget) lower
    bound."""
    from opentelemetry_collector_contrib_spark.functions.packing import (
        pack_sequences,
    )

    docs = docsrc.documents_df(spark, sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    bins = pack_sequences(
        docs, budget=PACK_BUDGET, num_shards=PACK_SHARDS, id_col="doc_id"
    )
    n_over_docs = docs.filter(F.col("n_tokens") > PACK_BUDGET).count()
    agg = bins.agg(
        F.sum("n_docs").alias("n_docs_packed"),
        F.sum(F.size(F.array_distinct("doc_ids"))).alias("n_docs_distinct"),
        F.sum("total_tokens").alias("total_tokens"),
        F.count(
            F.when(
                (F.col("n_docs") > 1) & (F.col("total_tokens") > PACK_BUDGET),
                True,
            )
        ).alias("multi_over_budget"),
        F.count(
            F.when(
                (F.col("n_docs") == 1) & (F.col("total_tokens") > PACK_BUDGET),
                True,
            )
        ).alias("_single_over"),
        F.count("*").alias("_n_bins"),
    )
    return agg.select(
        "n_docs_packed",
        "n_docs_distinct",
        "total_tokens",
        "multi_over_budget",
        (F.col("_single_over") == F.lit(n_over_docs)).alias(
            "oversized_alone_ok"
        ),
        (
            F.col("_n_bins")
            >= F.ceil(F.col("total_tokens") / F.lit(PACK_BUDGET))
        ).alias("bins_lb_ok"),
    )


def q_trace_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trace_parser (operator/helper/trace.go): hex ids -> bytes. Ids
    synthesized deterministically (md5 of conv_id = 16-byte trace id,
    its first 8 bytes = span id)."""
    turns = src.transcripts_df(spark, sf_dir)
    with_hex = turns.select(
        "conv_id",
        "turn_idx",
        F.md5(F.col("conv_id")).alias("trace_id_hex"),
        F.substring(F.md5(F.col("conv_id")), 1, 16).alias("span_id_hex"),
    )
    out = parsers.trace_parse(
        with_hex, trace_field="trace_id_hex", span_field="span_id_hex"
    )
    # Return hex STRINGS, not raw bytes: the driver canonicalizer sorts
    # result columns in pandas, which cannot hash bytearray cells. The
    # unhex round-trip is still exercised: hex(unhex(x)) == upper(x)
    # only when trace_parse produced the right bytes.
    return out.select(
        "conv_id",
        "turn_idx",
        F.hex("trace_id").alias("trace_id"),
        F.hex("span_id").alias("span_id"),
    )


_AV_SCALAR_T = parsers._OTLP_ANYVALUE_SCALAR
_AV_ARRAY_T = f"struct<values: array<{_AV_SCALAR_T}>>"
_AV_KV_T = (
    f"struct<values: array<struct<key: string, value: {_AV_SCALAR_T}>>>"
)


def _avs(string=None, intv=None, doublev=None, bytesv=None):
    """Scalar AnyValue struct (null-padded so arrays stay homogeneous)."""
    def _c(x, t):
        return (x if x is not None else F.lit(None)).cast(t)

    return F.struct(
        _c(string, "string").alias("stringValue"),
        _c(intv, "string").alias("intValue"),
        F.lit(None).cast("boolean").alias("boolValue"),
        _c(doublev, "double").alias("doubleValue"),
        _c(bytesv, "string").alias("bytesValue"),
    )


def _av(string=None, intv=None, doublev=None, bytesv=None, arr=None, kv=None):
    """Full AnyValue struct incl. arrayValue/kvlistValue variants."""
    base = _avs(string, intv, doublev, bytesv)
    scalar_fields = (
        "stringValue", "intValue", "boolValue", "doubleValue", "bytesValue"
    )
    return F.struct(
        *[base[f].alias(f) for f in scalar_fields],
        (
            F.struct(arr.alias("values"))
            if arr is not None
            else F.lit(None).cast(_AV_ARRAY_T)
        ).alias("arrayValue"),
        (
            F.struct(kv.alias("values"))
            if kv is not None
            else F.lit(None).cast(_AV_KV_T)
        ).alias("kvlistValue"),
    )


def q_otlpjson_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full OTLP-JSON logs envelope round-trip
    (connector/otlpjsonconnector/connector_logs.go; fixture shape in
    testdata/logsToLogs/input-log.yaml): transcripts are packed into
    resourceLogs[].scopeLogs[].logRecords[] envelopes (one per
    conversation), then parsed back through the explicit nested schema +
    explodes. The flattened records must equal the flat origin — the
    strongest evidence the envelope parse is lossless.

    Exercises the COMPLETE AnyValue model (pdata/pcommon/value.go): a
    deterministic fifth of bodies are kvlistValue (structured bodies);
    the ``meta`` attribute cycles kvlist / array / bytes / double / int,
    each flattened per Value.AsString (maps+slices to compact JSON with
    sorted keys, bytes staying base64)."""
    turns = src.transcripts_df(spark, sf_dir)
    m5 = F.col("turn_idx") % 5
    body = F.when(
        m5 == 0,
        _av(
            kv=F.array(
                F.struct(
                    F.lit("t").alias("key"),
                    _avs(string=F.col("text")).alias("value"),
                )
            )
        ),
    ).otherwise(_av(string=F.col("text")))
    meta = (
        F.when(
            m5 == 0,
            _av(
                kv=F.array(
                    F.struct(
                        F.lit("i").alias("key"),
                        _avs(intv=F.col("turn_idx").cast("string")).alias("value"),
                    ),
                    F.struct(
                        F.lit("r").alias("key"),
                        _avs(string=F.col("role")).alias("value"),
                    ),
                )
            ),
        )
        .when(
            m5 == 1,
            _av(
                arr=F.array(
                    _avs(string=F.col("role")),
                    _avs(intv=F.col("turn_idx").cast("string")),
                )
            ),
        )
        .when(m5 == 2, _av(bytesv=F.base64(F.col("role").cast("binary"))))
        .when(m5 == 3, _av(doublev=F.col("turn_idx") + 0.5))
        .otherwise(_av(intv=F.col("turn_idx").cast("string")))
    )
    rec = F.struct(
        F.lpad(F.col("turn_idx").cast("string"), 6, "0").alias("timeUnixNano"),
        F.lit("INFO").alias("severityText"),
        body.alias("body"),
        F.array(
            F.struct(F.lit("turn_idx").alias("key"),
                     _av(string=F.col("turn_idx").cast("string")).alias("value")),
            F.struct(F.lit("role").alias("key"),
                     _av(string=F.col("role")).alias("value")),
            F.struct(F.lit("meta").alias("key"), meta.alias("value")),
        ).alias("attributes"),
    )
    env = (
        turns.groupBy("conv_id")
        .agg(F.array_sort(F.collect_list(rec)).alias("logRecords"))
        .select(
            "conv_id",
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
                                        F.lit("transcripts").alias("name"),
                                        F.lit("1").alias("version"),
                                    ).alias("scope"),
                                    F.col("logRecords").alias("logRecords"),
                                )
                            ).alias("scopeLogs"),
                        )
                    ).alias("resourceLogs")
                )
            ).alias("text"),
        )
    )
    out = parsers.otlp_json_parse(env.select("text"))
    return out.select(
        F.col("resource_attrs")["conv.id"].alias("conv_id"),
        F.col("attributes")["turn_idx"].cast("int").alias("turn_idx"),
        F.col("attributes")["role"].alias("role"),
        F.col("body").alias("text"),
        F.col("attributes")["meta"].alias("meta"),
        "severity_text",
        "scope_name",
        "scope_version",
    )


#: ottl_extended statement corpus — the round-2 converter/editor tail
#: (ottlfuncs func_duration/weekday/formattime/to_key_value_string/
#: slice_to_map/delete_matching_keys/flatten/limit), each surfaced as a
#: string/number column both engines can mirror
_OTTL_EXT_STATEMENTS = [
    'set(dur_ns, Duration(durline))',
    'set(dur_min, Minutes(Duration(durline)))',
    'set(wd, Weekday(ts))',
    'set(fmtd, FormatTime(ts, "%Y/%m/%d %H:%M"))',
    'set(kvmap, ParseKeyValue(kvline))',
    'delete_matching_keys(kvmap, "^drop")',
    'limit(kvmap, 2, ["ck"])',
    'set(kv_str, ToKeyValueString(kvmap, "=", " ", true))',
    'set(s2m_str, ToKeyValueString(SliceToMap(arr, "name", "v"), "=", " ", true))',
    'flatten(nested, "pre")',
    'set(nested_str, ToKeyValueString(nested, "=", " ", true))',
    'set(xmlp, ParseXML(xmlline))',
    'set(csvmap_str, ToKeyValueString(ParseCSV(csvline, "h1,h2"), "=", " ", true))',
]


def q_ottl_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opentelemetry_collector_contrib_spark.operators import ottl

    turns = src.transcripts_df(spark, sf_dir)
    base = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        F.concat(
            (F.col("turn_idx") % 3).cast("string"),
            F.lit("h"),
            (F.col("turn_idx") % 60).cast("string"),
            F.lit("m"),
        ).alias("durline"),
        F.concat(
            F.lit("ak="), F.col("role"),
            F.lit(" ck=keep dropme=x bk="), (F.col("turn_idx") % 5).cast("string"),
        ).alias("kvline"),
        F.array(
            F.create_map(F.lit("name"), F.lit("n1"), F.lit("v"), F.col("role")),
            F.create_map(
                F.lit("name"), F.lit("n2"), F.lit("v"),
                (F.col("turn_idx") % 9).cast("string"),
            ),
        ).alias("arr"),
        F.create_map(
            F.lit("outer"),
            F.create_map(F.lit("in1"), F.col("role"), F.lit("in2"), F.lit("z")),
        ).alias("nested"),
        F.concat(
            F.lit('<r a="1"><t>'), F.col("role"), F.lit("</t></r>")
        ).alias("xmlline"),
        F.concat(F.col("role"), F.lit(',"x,'), (F.col("turn_idx") % 4).cast("string"),
                 F.lit('"')).alias("csvline"),
    )
    out = ottl.apply_statements(base, _OTTL_EXT_STATEMENTS)
    return out.select(
        "conv_id", "turn_idx", "dur_ns", "dur_min", "wd", "fmtd",
        "kv_str", "s2m_str", "nested_str", "xmlp", "csvmap_str",
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite text-analysis stage: language ID + quality scoring +
    token counting + rolling-hash fingerprint in ONE narrow projection
    (one scan — how a corpus-prep pipeline actually runs them).
    lang_id was a standalone board row through round 4; folded here
    (lang/pred_lang columns) to free a driver slot."""
    docs = docsrc.documents_df(spark, sf_dir)
    out = tx.lang_id(docs)
    out = tx.quality_score(out)
    out = tx.bpe_ish_count(tx.token_count(out))
    out = tx.doc_fingerprint(out, w=5)
    return out.select(
        "doc_id", "lang", "pred_lang",
        "length_ok", "alpha_ratio", "stop_sig", "word_len_ok",
        "quality", "n_tokens", "n_bpe", "fingerprint", "exact_hash",
    )


def q_text_stats_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only twin of ``text_stats`` at its round-3/4 scope (NO
    lang_id — that fold is round-5 work), so the cross-round
    ``comparable_19_total`` keeps timing an identical query. The board
    row stays the folded composite; this twin exists only for the
    bench's like-for-like subtotal."""
    docs = docsrc.documents_df(spark, sf_dir)
    out = tx.quality_score(docs)
    out = tx.bpe_ish_count(tx.token_count(out))
    out = tx.doc_fingerprint(out, w=5)
    return out.select(
        "doc_id", "length_ok", "alpha_ratio", "stop_sig", "word_len_ok",
        "quality", "n_tokens", "n_bpe", "fingerprint", "exact_hash",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Exactly 50 entries — the driver checks the first 50 queries, and
    # every operator here must get a CORRECTNESS row. Twin variants that
    # are pytest-proven equal (parse_regex_arrow, the single-purpose
    # redaction/enrich/time/digest sub-cases) are FOLDED into composite
    # queries rather than occupying slots; round 5 folded assign_keys
    # into transformer_suite and text_langid into text_stats to free
    # slots for ann_ivf_topk and repetition_signals, then folded
    # json/csv/uri_parse into structured_parse_suite to free slots for
    # decontamination and semdedup.
    return {
        "parse_regex": q_parse_regex,
        "parse_on_error_drop": q_parse_drop,
        "kv_parse": q_kv_parse,
        "severity_parse": q_severity,
        "time_parse": q_time_parse,
        "trace_parse": q_trace_parse,
        "enrich_broadcast": q_enrich,
        "route_per_sink_counts": q_route_per_sink_counts,
        "routed_rows": q_routed_rows,
        "count_multi_metric": q_count_multi_metric,
        "groupbyattrs": q_groupbyattrs,
        "sample_invariants": q_sample_invariants,
        "sum_items_by_team": q_sum_items_by_team,
        "log_dedup": q_log_dedup,
        "filter_transformer": q_filter_transformer,
        "recombine": q_recombine,
        "attributes_actions": q_attributes_actions,
        "redaction": q_redaction,
        "ottl_transform": q_ottl_transform,
        "conv_text_digest": q_conv_text_digest,
        "salted_count_by_role": q_salted_count_by_role,
        "jsonarray_parse": q_jsonarray_parse,
        "flatten_retain": q_flatten_retain,
        "resource_detection": q_resource_detection,
        "pack_sequences": q_pack_sequences,
        "syslog_rfc5424": q_syslog_rfc5424,
        "container_parse": q_container_parse,
        "container_recombine": q_container_recombine,
        "grok_parse": q_grok_parse,
        "structured_parse_suite": q_structured_parse_suite,
        "transformer_suite": q_transformer_suite,
        "attr_insert_update_delete": q_attr_insert_update_delete,
        "filter_processor_multi": q_filter_processor_multi,
        "otlpjson_connector": q_otlpjson_connector,
        "otlpjson_envelope": q_otlpjson_envelope,
        "ottl_extended": q_ottl_extended,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "ann_topk": q_ann_topk,
        "dedup_embedding_pairs": q_dedup_embedding_pairs,
        "corpus_clean": q_corpus_clean,
        "text_stats": q_text_stats,
        "multimodal_features": q_multimodal_features,
        "ann_ivf_topk": q_ann_ivf_topk,
        "repetition_signals": q_repetition_signals,
        "decontamination": q_decontamination,
        "semdedup": q_semdedup,
        "dsir_weights": q_dsir_weights,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect, backslashes literal)
# ---------------------------------------------------------------------------

_T = src.oracle_ctes(transcripts=True, dims=False)
_TD = src.oracle_ctes(transcripts=True, dims=True)

_PARSED_CTE = f"""
parsed AS (
  SELECT t.*,
    regexp_matches(text, '{_PAT_SQL}') AS parse_ok,
    CASE WHEN regexp_matches(text, '{_PAT_SQL}')
         THEN regexp_extract(text, '{_PAT_SQL}', 1) END AS ts_raw,
    CASE WHEN regexp_matches(text, '{_PAT_SQL}')
         THEN regexp_extract(text, '{_PAT_SQL}', 2) END AS level,
    CASE WHEN regexp_matches(text, '{_PAT_SQL}')
         THEN regexp_extract(text, '{_PAT_SQL}', 3) END AS component,
    CASE WHEN regexp_matches(text, '{_PAT_SQL}')
         THEN regexp_extract(text, '{_PAT_SQL}', 4) END AS msg
  FROM transcripts t
)
"""

_ENRICHED_CTE = f"""
enriched AS (
  SELECT p.*, cd.team, cd.env, cd.region, td.tool_family, td.risk_tier
  FROM parsed p
  LEFT JOIN conv_dim cd ON p.conv_id = cd.conv_id
  LEFT JOIN tool_dim td ON p.tool = td.tool
)
"""

_TAGGED_CTE = """
tagged AS (
  SELECT e.*,
    CASE
      WHEN level IN ('ERROR','FATAL') THEN 'errors'
      WHEN max(CASE WHEN level = 'FATAL' THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id) = 1 THEN 'incident'
      WHEN tool <> '' AND risk_tier = 'high' THEN 'risky_tools'
      ELSE 'default'
    END AS _route
  FROM enriched e
)
"""

_ROUTED_CTE = """
routed AS (
            SELECT 'errors' AS sink, * FROM tagged WHERE _route = 'errors'
  UNION ALL SELECT 'audit', * FROM tagged WHERE _route = 'errors'
  UNION ALL SELECT 'incident', * FROM tagged WHERE _route = 'incident'
  UNION ALL SELECT 'risky_tools', * FROM tagged WHERE _route = 'risky_tools'
  UNION ALL SELECT 'catchall', * FROM tagged WHERE _route = 'default'
)
"""

_SEV_CASE = " ".join(
    [f"WHEN '{k}' THEN {v}" for k, v in SEVERITY_TEXT_TO_NUM.items()]
    + [f"WHEN '{a}' THEN {SEVERITY_TEXT_TO_NUM[c]}" for a, c in SEVERITY_ALIASES.items()]
)


# --- training-data op oracles (documents/embeddings are pre-registered
# views in the DuckDB harness; dialect-portable md5/regex constructions
# mirror the Spark stages exactly) ---

_TOKS_CTE = (
    "toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t "
    "FROM documents)"
)

_SHINGLE_CTE = (
    "sh AS (SELECT DISTINCT doc_id, shingle FROM ("
    "  SELECT doc_id, unnest(list_transform("
    f"    generate_series(1, greatest(len(t) - {SHINGLE_W - 1}, 1)), "
    f"    i -> array_to_string(t[i:i+{SHINGLE_W - 1}], ' '))) AS shingle "
    "  FROM toks) WHERE shingle <> '')"
)

_SIG_CTE = "sig AS (SELECT doc_id, " + ", ".join(
    f"min(md5('{i}:' || shingle)) AS sig_{i}" for i in range(MINHASH_K)
) + " FROM sh GROUP BY doc_id)"

_R = MINHASH_K // LSH_BANDS
_PIPE_SEP = " || '|' || "
_BANDED_CTE = "banded AS (" + " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, "
    f"md5({_PIPE_SEP.join(f'sig_{b * _R + j}' for j in range(_R))}) AS bh FROM sig"
    for b in range(LSH_BANDS)
) + ")"

_SIMHASH_BITS = 16
_SIMHASH_SUMS = ", ".join(
    f"sum(CASE WHEN substr(h, {j + 1}, 1) IN "
    "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b" + str(j)
    for j in range(_SIMHASH_BITS)
)
_SIMHASH_FP = " || ".join(
    f"CASE WHEN b{j} > 0 THEN '1' ELSE '0' END" for j in range(_SIMHASH_BITS)
)

_COSINE = (
    "list_dot_product(e.embedding::DOUBLE[], q.q_vec) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.q_vec, q.q_vec)))"
)

_BUCKET_BITS = " || ".join(
    f"CASE WHEN {{v}}[{2 * p + 1}] >= {{v}}[{2 * p + 2}] THEN '1' ELSE '0' END"
    for p in range(ANN_PLANES)
)

_HITS = {
    lang: (
        "len(list_filter(t, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in ws)
        + "], x)))"
    )
    for lang, ws in tx.STOPWORDS.items()
}
_LANG_CASE = (
    "CASE WHEN greatest(" + ", ".join(f"h_{l}" for l in tx.STOPWORDS) + ") = 0 "
    "THEN 'und' "
    + " ".join(
        f"WHEN h_{l} = greatest(" + ", ".join(f"h_{m}" for m in tx.STOPWORDS) + ") "
        f"THEN '{l}'"
        for l in tx.STOPWORDS
    )
    + " END"
)

_ANN_TOPK_SQL = (
    "WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec, embedding AS q_raw "
    f"FROM embeddings WHERE vec_id < {ANN_QUERY_MAX}), "
    f"scored AS (SELECT q.q_id, e.vec_id, {_COSINE} AS sim "
    "FROM embeddings e, q WHERE e.vec_id <> q.q_id{extra}) "
    "SELECT q_id, cast(rank AS int) AS rank, vec_id, sim FROM ("
    "  SELECT q_id, vec_id, sim, row_number() OVER "
    "    (PARTITION BY q_id ORDER BY sim DESC, vec_id DESC) AS rank FROM scored) "
    f"WHERE rank <= {ANN_K}"
)

_QUALITY_EXPRS = """
  sel AS (SELECT d.doc_id,
    cast(length(d.text) AS double) AS chars,
    cast(length(regexp_replace(d.text, '[^A-Za-z0-9]', '', 'g')) AS double) AS alpha,
    cast(len(tk.t) AS double) AS n_tok,
    cast({h_en} AS double) AS h_en
  FROM documents d JOIN (SELECT doc_id, t FROM toks) tk ON d.doc_id = tk.doc_id),
  comp AS (SELECT doc_id,
    CASE WHEN chars < 20 THEN chars/20 WHEN chars > 20000 THEN 20000.0/chars
         ELSE 1.0 END AS length_ok,
    CASE WHEN chars > 0 THEN alpha/chars ELSE 0.0 END AS alpha_ratio,
    least(1.0, h_en/5) AS stop_sig,
    CASE WHEN n_tok > 0 AND alpha/n_tok >= 3 AND alpha/n_tok <= 12
         THEN 1.0 ELSE 0.0 END AS word_len_ok
  FROM sel)
"""


def oracle_sql() -> dict[str, str]:
    parse_select = (
        "SELECT conv_id, turn_idx, parse_ok, ts_raw, level, component, msg FROM parsed"
    )
    _DET = processors.detect_system()
    return {
        "parse_regex": f"{_T}, {_PARSED_CTE} {parse_select}",
        "parse_on_error_drop": f"{_T}, {_PARSED_CTE} "
        "SELECT conv_id, turn_idx, level, msg FROM parsed WHERE parse_ok",
        "kv_parse": f"{_T}, {_PARSED_CTE} "
        "SELECT conv_id, turn_idx, "
        "CASE WHEN msg IS NOT NULL THEN regexp_extract(msg, 'user=([0-9]+)', 1) END AS kv_user, "
        "CASE WHEN msg IS NOT NULL THEN regexp_extract(msg, 'items=(-?[0-9]+)', 1) END AS kv_items "
        "FROM parsed",
        "severity_parse": f"{_T}, {_PARSED_CTE} "
        f"SELECT conv_id, turn_idx, upper(level) AS severity_text, "
        f"coalesce(CASE upper(level) {_SEV_CASE} END, 0) AS severity_num, "
        "CASE WHEN (turn_idx % 400) + 200 < 300 THEN 9 "
        "WHEN (turn_idx % 400) + 200 < 400 THEN 15 "
        "WHEN (turn_idx % 400) + 200 < 500 THEN 17 ELSE 21 END AS custom_num, "
        "CASE WHEN (turn_idx % 400) + 200 < 300 THEN 'INFO' "
        "WHEN (turn_idx % 400) + 200 < 400 THEN 'WARN3' "
        "WHEN (turn_idx % 400) + 200 < 500 THEN 'ERROR' ELSE 'FATAL' END "
        "AS custom_text FROM parsed",
        "time_parse": f"{_T}, {_PARSED_CTE} "
        "SELECT conv_id, turn_idx, "
        "CASE WHEN ts_raw IS NOT NULL THEN "
        "cast(replace(replace(ts_raw, 'T', ' '), 'Z', '') AS timestamp) END AS event_ts, "
        "CASE WHEN ts_raw IS NOT NULL THEN "
        "cast(replace(replace(ts_raw, 'T', ' '), 'Z', '') AS timestamp) END AS gotime_ts, "
        "date_trunc('milliseconds', ts) AS epoch_ts "
        "FROM parsed",
        "trace_parse": f"{_T} "
        "SELECT conv_id, turn_idx, hex(unhex(md5(conv_id))) AS trace_id, "
        "hex(unhex(substr(md5(conv_id), 1, 16))) AS span_id FROM transcripts",
        "enrich_broadcast": f"{_TD}, {_PARSED_CTE}, {_ENRICHED_CTE} "
        "SELECT conv_id, turn_idx, team, "
        "coalesce(CASE WHEN role = 'system' THEN 'forced-env' END, env) AS env, "
        "region, tool_family, risk_tier FROM enriched",
        "route_per_sink_counts": f"{_TD}, {_PARSED_CTE}, {_ENRICHED_CTE}, {_TAGGED_CTE}, {_ROUTED_CTE} "
        "SELECT sink, count(*) AS n FROM routed GROUP BY sink ORDER BY sink",
        "routed_rows": f"{_TD}, {_PARSED_CTE}, {_ENRICHED_CTE}, {_TAGGED_CTE}, {_ROUTED_CTE} "
        "SELECT sink, conv_id, turn_idx, text FROM routed",
        "count_multi_metric": f"{_TD}, {_PARSED_CTE}, "
        "ec AS (SELECT p.*, cd.team FROM parsed p "
        "LEFT JOIN conv_dim cd ON p.conv_id = cd.conv_id) "
        "SELECT 'turns.by_tool_role' AS metric, tool, role, "
        "cast(NULL AS string) AS team, "
        "cast(count(*) AS bigint) AS n FROM ec "
        "WHERE tool IS NOT NULL AND tool <> '' GROUP BY tool, role "
        "UNION ALL "
        "SELECT 'turns.by_tool_role_default', "
        "CASE WHEN tool IS NULL OR tool = '' THEN 'none' ELSE tool END, "
        "role, cast(NULL AS string), cast(count(*) AS bigint) "
        "FROM ec GROUP BY 2, 3 "
        "UNION ALL "
        "SELECT 'assistant.turns', NULL, role, cast(NULL AS string), "
        "cast(count(*) AS bigint) "
        "FROM ec WHERE role = 'assistant' "
        "AND role IS NOT NULL AND role <> '' GROUP BY role "
        "UNION ALL "
        "SELECT 'errors.per_team', NULL, NULL, team, "
        "cast(count(*) AS bigint) FROM ec "
        "WHERE level = 'ERROR' AND team IS NOT NULL AND team <> '' "
        "GROUP BY team",
        "groupbyattrs": f"{_T}, {_PARSED_CTE} "
        "SELECT conv_id, turn_idx, tool, "
        "cast(count(*) OVER (PARTITION BY tool) AS bigint) AS group_size, "
        "text FROM parsed",
        "sample_invariants": (
            f"SELECT lang, cast(least({SAMPLE_K}, count(*)) AS bigint) "
            "AS n_exact, TRUE AS exact_member, TRUE AS exact_stable, "
            "TRUE AS frac_tol_ok, TRUE AS frac_stable, "
            "TRUE AS gexact_stable, TRUE AS glarge_eq, "
            "TRUE AS shuffle_ordered "
            "FROM documents GROUP BY lang"
        ),
        "sum_items_by_team": f"{_TD}, {_PARSED_CTE} "
        "SELECT cd.team, cast(sum(cast(regexp_extract(p.msg, 'items=(-?[0-9]+)', 1) "
        "AS bigint)) AS bigint) "
        "AS sum_items FROM parsed p "
        "JOIN conv_dim cd ON p.conv_id = cd.conv_id "
        "WHERE p.parse_ok AND cd.team IS NOT NULL AND cd.team <> '' GROUP BY cd.team",
        "log_dedup": f"{_T}, {_PARSED_CTE} "
        "SELECT role, level, tool, count(*) AS log_count, "
        "min(ts) AS first_observed_ts, max(ts) AS last_observed_ts, "
        "'full' AS variant FROM parsed GROUP BY role, level, tool "
        "UNION ALL "
        "SELECT role, level, cast(NULL AS string), count(*), min(ts), "
        "max(ts), 'exclude_tool' FROM parsed GROUP BY role, level",
        "filter_transformer": f"{_T} "
        "SELECT conv_id, turn_idx, role FROM transcripts WHERE NOT (role = 'system')",
        "recombine": f"{_T} "
        "SELECT conv_id, min(turn_idx) AS turn_idx, "
        "string_agg(text, chr(10) ORDER BY turn_idx) AS text, "
        "count(*) AS n_combined FROM ("
        "  SELECT t.*, coalesce(sum(CASE WHEN turn_idx % 5 = 4 THEN 1 ELSE 0 END) "
        "  OVER (PARTITION BY conv_id ORDER BY turn_idx "
        "        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS gid "
        "  FROM transcripts t) GROUP BY conv_id, gid",
        "attributes_actions": f"{_T}, {_PARSED_CTE} "
        "SELECT conv_id, turn_idx, 'logs' AS pipeline, sha256(conv_id) AS conv_hash, "
        "cast(CASE WHEN regexp_matches(component, '^svc-([0-9]+)$') "
        "THEN regexp_extract(component, '^svc-([0-9]+)$', 1) END AS bigint) AS svc_num "
        "FROM parsed",
        "redaction": f"{_T} "
        "SELECT conv_id, turn_idx, role, "
        "regexp_replace(text, 'user=[0-9]+', '****', 'g') AS redacted, "
        "CASE WHEN regexp_matches(text, 'user=[0-9]+') THEN 1 ELSE 0 END "
        "AS masked_count, "
        "CASE WHEN regexp_matches(text, 'user=[0-9]+') THEN 'text' ELSE '' END "
        "AS masked_keys, "
        "2 AS redacted_count, 'tool,ts' AS redacted_keys FROM transcripts",
        "jsonarray_parse": f"{_T} "
        "SELECT conv_id, turn_idx, role AS e1, tool AS e2 FROM transcripts",
        "flatten_retain": f"{_T} "
        "SELECT conv_id, turn_idx, role, tool FROM transcripts",
        # the oracle runs the SAME driver-side probe (same host, same
        # values) so the row checks the real detector output
        "resource_detection": f"{_T} "
        f"SELECT conv_id, turn_idx, '{_DET['os.type']}' AS os_type, "
        "'none' AS cloud_provider, "
        "CASE WHEN role = 'system' THEN 'pinned-host' ELSE "
        f"'{_DET['host.name']}' END AS host_name, "
        f"'{_DET['host.arch']}' AS host_arch FROM transcripts",
        "pack_sequences": (
            "SELECT cast(count(*) AS bigint) AS n_docs_packed, "
            "cast(count(DISTINCT doc_id) AS bigint) AS n_docs_distinct, "
            "cast(sum(len(string_split(text, ' '))) AS bigint) "
            "AS total_tokens, "
            "cast(0 AS bigint) AS multi_over_budget, "
            "TRUE AS oversized_alone_ok, TRUE AS bins_lb_ok "
            "FROM documents"
        ),
        "syslog_rfc5424": f"{_T}, "
        f"lines AS (SELECT conv_id, turn_idx, {_SYSLOG_LINE} AS text FROM transcripts) "
        f"SELECT conv_id, turn_idx, regexp_matches(text, '{_RFC5424_SQL}') AS parse_ok, "
        + ", ".join(
            f"CASE WHEN regexp_matches(text, '{_RFC5424_SQL}') THEN "
            f"regexp_extract(text, '{_RFC5424_SQL}', {i}) END AS {name}"
            for i, name in ((4, "hostname"), (5, "appname"), (9, "message"))
        )
        + f", CASE WHEN regexp_matches(text, '{_RFC5424_SQL}') THEN "
        f"cast(floor(cast(regexp_extract(text, '{_RFC5424_SQL}', 1) AS int) / 8) AS int) END "
        "AS facility, "
        f"CASE WHEN regexp_matches(text, '{_RFC5424_SQL}') THEN "
        f"cast(regexp_extract(text, '{_RFC5424_SQL}', 1) AS int) % 8 END AS severity "
        "FROM lines",
        "container_parse": f"{_T}, "
        f"lines AS (SELECT conv_id, turn_idx, {_CONTAINER_LINE} AS text FROM transcripts) "
        "SELECT conv_id, turn_idx, "
        "CASE WHEN text LIKE '{%' THEN 'docker' "
        f"WHEN regexp_matches(text, '{_CRI_SQL}') THEN 'cri' ELSE 'unknown' END "
        "AS container_format, "
        "CASE WHEN text LIKE '{%' THEN json_extract_string(text, '$.time') "
        f"ELSE regexp_extract(text, '{_CRI_SQL}', 1) END AS container_time, "
        "CASE WHEN text LIKE '{%' THEN json_extract_string(text, '$.stream') "
        f"ELSE regexp_extract(text, '{_CRI_SQL}', 2) END AS stream, "
        "CASE WHEN text LIKE '{%' THEN 'F' "
        f"ELSE regexp_extract(text, '{_CRI_SQL}', 3) END AS logtag, "
        "CASE WHEN text LIKE '{%' THEN json_extract_string(text, '$.log') "
        f"ELSE regexp_extract(text, '{_CRI_SQL}', 4) END AS log "
        "FROM lines",
        "container_recombine": f"{_T}, "
        f"lines AS (SELECT conv_id, turn_idx, {_CRI_LINE} AS text FROM transcripts), "
        f"parsed AS (SELECT conv_id, turn_idx, "
        f"regexp_extract(text, '{_CRI_SQL}', 4) AS log, "
        "CASE WHEN turn_idx % 3 = 2 THEN 1 ELSE 0 END AS is_f FROM lines), "
        "gids AS (SELECT *, coalesce(sum(is_f) OVER (PARTITION BY conv_id "
        "ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS gid FROM parsed) "
        "SELECT conv_id, min(turn_idx) AS turn_idx, "
        "string_agg(log, '' ORDER BY turn_idx) AS log, count(*) AS n_combined "
        "FROM gids GROUP BY conv_id, gid",
        "grok_parse": f"{_T} "
        f"SELECT conv_id, turn_idx, regexp_matches(text, '{_GROK_SQL}') AS parse_ok, "
        + ", ".join(
            f"CASE WHEN regexp_matches(text, '{_GROK_SQL}') THEN "
            f"regexp_extract(text, '{_GROK_SQL}', {i + 1}) END AS {g}"
            for i, g in enumerate(["g_ts", "g_level", "g_svc", "g_rest"])
        )
        + " FROM transcripts",
        # expected CSV fields computed from the ORIGIN columns — the
        # quoted-field/short-row/trailing-empty semantics under test
        # can't be mirrored by split_part, which is the point
        "structured_parse_suite": f"{_T}, "
        f"lines AS (SELECT conv_id, turn_idx, role, tool, "
        f"{_JSON_LINE} AS jline, {_URI_LINE} AS uri FROM transcripts) "
        "SELECT conv_id, turn_idx, "
        "TRUE AS json_ok, "
        "cast(json_extract(jline, '$.a') AS bigint) AS a, "
        "json_extract_string(jline, '$.b') AS b, "
        "turn_idx % 7 <> 0 AS csv_ok, "
        "role AS c_role, "
        "CASE WHEN turn_idx % 7 = 0 THEN NULL ELSE tool || ',q' END AS c_tool, "
        "CASE WHEN turn_idx % 7 = 0 THEN NULL WHEN turn_idx % 7 = 3 THEN '' "
        "ELSE cast(turn_idx AS string) END AS c_idx, "
        "regexp_extract(uri, '^([a-z]+)://', 1) AS scheme, "
        "regexp_extract(uri, '^[a-z]+://([^/?#]+)', 1) AS host, "
        "regexp_extract(uri, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path, "
        "regexp_extract(uri, '\\?([^#]*)', 1) AS query FROM lines",
        "transformer_suite": f"{_T} "
        "SELECT conv_id, turn_idx, 'logs' AS pipeline, "
        "CASE WHEN role = 'system' THEN 'sys' END AS env_kind, "
        "conv_id AS conv_copy, role AS actor, tool AS quoted_tool, "
        "regexp_replace(text, '\\d', '#', 'g') AS masked, "
        "role AS v_role, tool AS v_tool FROM transcripts",
        "attr_insert_update_delete": f"{_T} "
        "SELECT conv_id, turn_idx, "
        "CASE WHEN role = 'system' THEN 'PRE-SET' ELSE 'INSERTED' END AS env, "
        "'fresh' AS note FROM transcripts",
        "filter_processor_multi": f"{_T} "
        "SELECT conv_id, turn_idx, role, tool FROM transcripts "
        "WHERE NOT (role = 'system' OR tool = 'bash')",
        "otlpjson_connector": f"{_T} "
        "SELECT conv_id, turn_idx, role AS body, 'INFO' AS severityText, "
        "tool AS attr_tool FROM transcripts",
        # envelope round-trip: packing + parsing must be lossless, so the
        # expected rows are simply the flat origin plus the constant
        # resource/scope metadata the packer stamps
        "otlpjson_envelope": f"{_T} "
        "SELECT conv_id, turn_idx, role, "
        "CASE WHEN turn_idx % 5 = 0 "
        "THEN '{\"t\":' || to_json(text) || '}' ELSE text END AS text, "
        "CASE turn_idx % 5 "
        "WHEN 0 THEN '{\"i\":' || turn_idx || ',\"r\":' || to_json(role) || '}' "
        "WHEN 1 THEN '[' || to_json(role) || ',' || turn_idx || ']' "
        "WHEN 2 THEN to_base64(encode(role)) "
        "WHEN 3 THEN cast(turn_idx + 0.5 AS varchar) "
        "ELSE cast(turn_idx AS varchar) END AS meta, "
        "'INFO' AS severity_text, "
        "'transcripts' AS scope_name, '1' AS scope_version FROM transcripts",
        "ottl_extended": f"{_T} "
        "SELECT conv_id, turn_idx, "
        "cast((turn_idx % 3) * 3600000000000 + (turn_idx % 60) * 60000000000 "
        "AS bigint) AS dur_ns, "
        "cast((turn_idx % 3) * 60 + (turn_idx % 60) AS double) AS dur_min, "
        "cast(dayofweek(ts) AS bigint) AS wd, "
        "strftime(ts, '%Y/%m/%d %H:%M') AS fmtd, "
        "'ak=' || role || ' ck=keep' AS kv_str, "
        "'n1=' || role || ' n2=' || cast(turn_idx % 9 AS string) AS s2m_str, "
        "'pre.outer.in1=' || role || ' pre.outer.in2=z' AS nested_str, "
        "'{\"attributes\":{\"a\":\"1\"},\"children\":[{\"content\":\"' || role || "
        "'\",\"tag\":\"t\"}],\"tag\":\"r\"}' AS xmlp, "
        "'h1=' || role || ' h2=x,' || cast(turn_idx % 4 AS string) AS csvmap_str "
        "FROM transcripts",
        "conv_text_digest": f"{_T}, "
        "flat AS (SELECT conv_id, count(*) AS n_turns, "
        "md5(string_agg(text, chr(10) ORDER BY turn_idx)) AS digest "
        "FROM transcripts GROUP BY conv_id), "
        "sub AS (SELECT conv_id, cast(floor(turn_idx / 8) AS bigint) AS blk, "
        "md5(string_agg(text, chr(10) ORDER BY turn_idx)) AS subd "
        "FROM transcripts GROUP BY 1, 2), "
        "hier AS (SELECT conv_id, "
        "md5(string_agg(subd, chr(10) ORDER BY blk)) AS digest_hier "
        "FROM sub GROUP BY conv_id) "
        "SELECT f.conv_id, f.n_turns, f.digest, h.digest_hier "
        "FROM flat f JOIN hier h ON f.conv_id = h.conv_id",
        "salted_count_by_role": f"{_T} "
        "SELECT role, count(*) AS n FROM transcripts GROUP BY role",
        "ottl_transform": f"{_T} "
        "SELECT conv_id, turn_idx, 'logs' AS pipeline, upper(role) AS norm_role, "
        "regexp_replace(text, 'user=[0-9]+', 'user=****', 'g') AS redacted, "
        "CASE WHEN role = 'assistant' THEN sha256(conv_id) END AS conv_hash "
        "FROM transcripts",
        # --- training-data ops ---
        "dedup_exact": (
            "SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS content_hash, "
            "min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY 1"
        ),
        # capped CTE mirrors lsh_pairs' max_band_size=1000 hot-band guard
        # (deterministic doc_id-ordered truncation) so engine and oracle
        # agree under ANY band-size distribution, not just small ones
        "dedup_minhash_lsh": (
            f"WITH {_TOKS_CTE}, {_SHINGLE_CTE}, {_SIG_CTE}, {_BANDED_CTE}, "
            "capped AS (SELECT * FROM banded "
            "QUALIFY row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) "
            "<= 1000) "
            "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "FROM capped a JOIN capped b "
            "ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id"
        ),
        "dedup_simhash": (
            "WITH tok AS (SELECT doc_id, md5(unnest(regexp_extract_all(lower(text), "
            "'[a-z0-9]+'))) AS h FROM documents), "
            f"b AS (SELECT doc_id, {_SIMHASH_SUMS} FROM tok GROUP BY doc_id) "
            f"SELECT doc_id, {_SIMHASH_FP} AS simhash FROM b"
        ),
        "decontamination": (
            f"WITH {_TOKS_CTE}, {_SHINGLE_CTE}, "
            f"ev AS (SELECT DISTINCT shingle FROM sh "
            f"WHERE doc_id % {DECON_EVAL_MOD} = 0), "
            "rep AS (SELECT s.doc_id, count(*) AS n_ngrams, "
            "count(ev.shingle) AS n_contaminated "
            "FROM sh s LEFT JOIN ev ON s.shingle = ev.shingle "
            "GROUP BY s.doc_id) "
            # zero-shingle docs keep a row (n_ngrams=0, clean) — the
            # Spark side joins the id spine back for the same reason
            "SELECT d.doc_id, coalesce(r.n_ngrams, 0) AS n_ngrams, "
            "coalesce(r.n_contaminated, 0) AS n_contaminated, "
            "coalesce(cast(r.n_contaminated AS double) / r.n_ngrams, 0.0) "
            "AS contamination, "
            "coalesce(r.n_contaminated, 0) >= 1 AS contaminated "
            "FROM documents d LEFT JOIN rep r ON d.doc_id = r.doc_id"
        ),
        "semdedup": (
            "WITH bk AS (SELECT vec_id, embedding, "
            + _BUCKET_BITS.format(v="embedding")
            + " AS cell FROM embeddings), "
            "dropped AS (SELECT DISTINCT a.vec_id FROM bk a JOIN bk b "
            "ON a.cell = b.cell AND a.vec_id > b.vec_id "
            "WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
            "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
            "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) "
            f">= {SEMDEDUP_THRESHOLD}) "
            "SELECT vec_id, cell FROM bk "
            "WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.vec_id = bk.vec_id)"
        ),
        "dedup_ngram_jaccard": (
            f"WITH {_TOKS_CTE}, {_SHINGLE_CTE}, "
            "sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id), "
            "common_t AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "count(*) AS common FROM sh a JOIN sh b "
            "ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, common, "
            "cast(common AS double) / (sa.sz + sb.sz - common) AS jaccard "
            "FROM common_t JOIN sizes sa ON sa.doc_id = doc_a "
            "JOIN sizes sb ON sb.doc_id = doc_b "
            "ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20"
        ),
        "corpus_clean": _corpus_oracle_sql(),
        "dedup_embedding_pairs": (
            "WITH bk AS (SELECT vec_id, embedding, "
            + _BUCKET_BITS.format(v="embedding")
            + " AS b FROM embeddings) "
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
            "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
            "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS sim "
            "FROM bk a JOIN bk b ON a.b = b.b AND a.vec_id < b.vec_id "
            "ORDER BY sim DESC, vec_a, vec_b LIMIT 20"
        ),
        "ann_topk": (
            "SELECT 'brute' AS method, * FROM ("
            + _ANN_TOPK_SQL.format(extra="")
            + ") UNION ALL SELECT 'lsh' AS method, * FROM ("
            + _ANN_TOPK_SQL.format(
                extra=" AND " + _BUCKET_BITS.format(v="e.embedding")
                + " = " + _BUCKET_BITS.format(v="q.q_raw")
            )
            + ")"
        ),
        "dsir_weights": (
            f"WITH {_TOKS_CTE}, "
            "terms AS (SELECT doc_id, unnest(list_concat(t, "
            "list_transform(generate_series(1, greatest(len(t) - 1, 1)), "
            "i -> array_to_string(t[i:i+1], ' ')))) AS term FROM toks), "
            "tf AS (SELECT doc_id, left(md5(term), 2) AS bucket "
            "FROM terms WHERE term <> ''), "
            "cr AS (SELECT bucket, count(*) AS c_raw FROM tf GROUP BY bucket), "
            "ct AS (SELECT bucket, count(*) AS c_tgt FROM tf "
            f"WHERE doc_id % {DSIR_TARGET_MOD} = 0 GROUP BY bucket), "
            "lam AS (SELECT cr.bucket, "
            "ln((coalesce(ct.c_tgt, 0) + 1.0) / "
            "((SELECT coalesce(sum(c_tgt), 0) FROM ct) + 256.0)) - "
            "ln((cr.c_raw + 1.0) / ((SELECT sum(c_raw) FROM cr) + 256.0)) "
            "AS lam FROM cr LEFT JOIN ct ON cr.bucket = ct.bucket) "
            "SELECT tf.doc_id, count(*) AS n_terms, sum(lam.lam) AS logw, "
            "sum(lam.lam) / count(*) AS avg_logw "
            "FROM tf JOIN lam ON tf.bucket = lam.bucket GROUP BY tf.doc_id"
        ),
        "text_stats": (
            f"WITH {_TOKS_CTE}, "
            + _QUALITY_EXPRS.format(h_en=_HITS["en"].replace("(t,", "(tk.t,"))
            + ", hits AS (SELECT d.doc_id, d.lang, "
            + ", ".join(f"{_HITS[l]} AS h_{l}" for l in tx.STOPWORDS)
            + " FROM documents d JOIN toks tk ON d.doc_id = tk.doc_id)"
            + " SELECT c.doc_id, h.lang, "
            f"{_LANG_CASE} AS pred_lang, "
            "c.length_ok, c.alpha_ratio, c.stop_sig, "
            "c.word_len_ok, "
            "0.25*c.length_ok + 0.25*c.alpha_ratio + 0.25*c.stop_sig + "
            "0.25*c.word_len_ok AS quality, "
            "cast(len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS int) "
            "AS n_tokens, "
            "cast(len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) "
            "AS int) AS n_bpe, "
            "list_min(list_transform(generate_series(1, greatest(len(tk.t) - 4, 1)), "
            "i -> md5(array_to_string(tk.t[i:i+4], ' ')))) AS fingerprint, "
            "md5(lower(regexp_replace(d.text, '\\s+', ' ', 'g'))) AS exact_hash "
            "FROM comp c JOIN documents d ON c.doc_id = d.doc_id "
            "JOIN toks tk ON c.doc_id = tk.doc_id "
            "JOIN hits h ON c.doc_id = h.doc_id"
        ),
        "multimodal_features": (
            "SELECT doc_id, "
            "CASE cast(doc_id % 3 AS int) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
            "ELSE 'video' END AS kind, "
            "cast(4 + octet_length(encode(text)) AS bigint) AS n_bytes, "
            "cast(CASE WHEN doc_id % 3 = 0 THEN 1 "
            "ELSE greatest(octet_length(encode(text)) // 100, 1) END AS int) "
            "AS frame_count FROM documents"
        ),
        # full probe (nprobe == nlist) makes IVF exactly brute force, so
        # the oracle is the same kNN SQL the brute-force row replays
        "ann_ivf_topk": _ANN_TOPK_SQL.format(extra=""),
        "repetition_signals": _repetition_oracle_sql(),
    }
