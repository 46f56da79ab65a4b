"""Driver contract: flagship entry + per-operator queries + DuckDB oracles.

Every query here is an operator from SURVEY.md §2 applied to the
deterministic ``transcripts`` table (BASELINE.json input_hint shape),
which both engines derive from the driver's parquet through ONE portable
SQL string (opentelemetry_collector_contrib_spark/sources/transcripts.py)
— so oracle comparisons check operator semantics, not generator drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

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


def q_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = parsers.severity_parse(_parsed(spark, sf_dir), parse_from="level")
    return df.select("conv_id", "turn_idx", "severity_text", "severity_num")


def q_time_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = parsers.time_parse(_parsed(spark, sf_dir), parse_from="ts_raw")
    return df.select("conv_id", "turn_idx", "event_ts")


def q_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _parsed(spark, sf_dir)
    df = processors.enrich_lookup(df, src.conv_dim_df(spark, sf_dir), on="conv_id")
    df = processors.enrich_lookup(df, src.tool_dim_df(spark), on="tool")
    return df.select(
        "conv_id", "turn_idx", "team", "env", "region", "tool_family", "risk_tier"
    )


def q_enrich_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """setResourceAttribute semantics: pre-existing non-null attr wins
    (k8sattributesprocessor/processor.go:189-194)."""
    df = _parsed(spark, sf_dir)
    df = df.withColumn(
        "env", F.when(F.col("role") == "system", F.lit("forced-env"))
    )
    df = processors.enrich_lookup(df, src.conv_dim_df(spark, sf_dir), on="conv_id")
    return df.select("conv_id", "turn_idx", "env")


def q_route_per_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    result = pipeline.build(spark, sf_dir)
    return pipeline.per_sink_counts(result)


def q_routed_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routed-row set equality incl. per-turn text — the north-rule check."""
    result = pipeline.build(spark, sf_dir)
    routed = connectors.routed_union(result.tagged, result.sink_map)
    return routed.select("sink", "conv_id", "turn_idx", "text")


def q_count_by_tool_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countconnector missing-attr exclusion (counter.go:71-73): tool=''
    rows are excluded."""
    turns = src.transcripts_df(spark, sf_dir)
    return connectors.count_connector(turns, ["tool", "role"], name="n")


def q_count_by_tool_role_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countconnector with default_value for missing attr (config.go:186-190)."""
    turns = src.transcripts_df(spark, sf_dir)
    return connectors.count_connector(
        turns, ["tool", "role"], defaults={"tool": "none"}, name="n"
    )


def q_errors_per_team(spark: SparkSession, sf_dir: str) -> DataFrame:
    """conditional count (counter.go:76-86) over enriched stream."""
    df = _parsed(spark, sf_dir)
    df = processors.enrich_lookup(df, src.conv_dim_df(spark, sf_dir), on="conv_id")
    return connectors.count_connector(
        df, ["team"], condition=F.col("level") == "ERROR", name="n"
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
    """logdedup processor: collapse dup (role, level, tool) rows."""
    df = _parsed(spark, sf_dir)
    return processors.log_dedup(df, ["role", "level", "tool"], ts_col="ts")


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
    """redactionprocessor: mask user=N values in text."""
    turns = src.transcripts_df(spark, sf_dir)
    out = processors.redact(
        turns, mask_patterns={"user_ids": r"user=\d+"}, mask_cols=["text"]
    )
    return out.select("conv_id", "turn_idx", F.col("text").alias("redacted"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "parse_regex": q_parse_regex,
        "parse_regex_arrow": q_parse_regex_arrow,
        "parse_on_error_drop": q_parse_drop,
        "kv_parse": q_kv_parse,
        "severity_parse": q_severity,
        "time_parse": q_time_parse,
        "enrich_broadcast": q_enrich,
        "enrich_insert_if_absent": q_enrich_insert_if_absent,
        "route_per_sink_counts": q_route_per_sink_counts,
        "routed_rows": q_routed_rows,
        "count_by_tool_role": q_count_by_tool_role,
        "count_by_tool_role_default": q_count_by_tool_role_default,
        "errors_per_team": q_errors_per_team,
        "sum_items_by_team": q_sum_items_by_team,
        "log_dedup": q_log_dedup,
        "filter_transformer": q_filter_transformer,
        "recombine": q_recombine,
        "attributes_actions": q_attributes_actions,
        "redaction": q_redaction,
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


def oracle_sql() -> dict[str, str]:
    parse_select = (
        "SELECT conv_id, turn_idx, parse_ok, ts_raw, level, component, msg FROM parsed"
    )
    return {
        "parse_regex": f"{_T}, {_PARSED_CTE} {parse_select}",
        "parse_regex_arrow": f"{_T}, {_PARSED_CTE} {parse_select}",
        "parse_on_error_drop": f"{_T}, {_PARSED_CTE} "
        "SELECT conv_id, turn_idx, level, msg FROM parsed WHERE parse_ok",
        "kv_parse": f"{_T}, {_PARSED_CTE} "
        "SELECT conv_id, turn_idx, "
        "CASE WHEN msg IS NOT NULL THEN regexp_extract(msg, 'user=([0-9]+)', 1) END AS kv_user, "
        "CASE WHEN msg IS NOT NULL THEN regexp_extract(msg, 'items=(-?[0-9]+)', 1) END AS kv_items "
        "FROM parsed",
        "severity_parse": f"{_T}, {_PARSED_CTE} "
        f"SELECT conv_id, turn_idx, upper(level) AS severity_text, "
        f"coalesce(CASE upper(level) {_SEV_CASE} END, 0) AS severity_num FROM parsed",
        "time_parse": f"{_T}, {_PARSED_CTE} "
        "SELECT conv_id, turn_idx, "
        "CASE WHEN ts_raw IS NOT NULL THEN "
        "cast(replace(replace(ts_raw, 'T', ' '), 'Z', '') AS timestamp) END AS event_ts "
        "FROM parsed",
        "enrich_broadcast": f"{_TD}, {_PARSED_CTE}, {_ENRICHED_CTE} "
        "SELECT conv_id, turn_idx, team, env, region, tool_family, risk_tier FROM enriched",
        "enrich_insert_if_absent": f"{_TD}, {_PARSED_CTE} "
        "SELECT p.conv_id, p.turn_idx, "
        "coalesce(CASE WHEN p.role = 'system' THEN 'forced-env' END, cd.env) AS env "
        "FROM parsed p LEFT JOIN conv_dim cd ON p.conv_id = cd.conv_id",
        "route_per_sink_counts": f"{_TD}, {_PARSED_CTE}, {_ENRICHED_CTE}, {_TAGGED_CTE}, {_ROUTED_CTE} "
        "SELECT sink, count(*) AS n FROM routed GROUP BY sink ORDER BY sink",
        "routed_rows": f"{_TD}, {_PARSED_CTE}, {_ENRICHED_CTE}, {_TAGGED_CTE}, {_ROUTED_CTE} "
        "SELECT sink, conv_id, turn_idx, text FROM routed",
        "count_by_tool_role": f"{_T} "
        "SELECT tool, role, count(*) AS n FROM transcripts "
        "WHERE tool IS NOT NULL AND tool <> '' GROUP BY tool, role",
        "count_by_tool_role_default": f"{_T} "
        "SELECT CASE WHEN tool IS NULL OR tool = '' THEN 'none' ELSE tool END AS tool, "
        "role, count(*) AS n FROM transcripts GROUP BY 1, 2",
        "errors_per_team": f"{_TD}, {_PARSED_CTE} "
        "SELECT cd.team, count(*) AS n FROM parsed p "
        "JOIN conv_dim cd ON p.conv_id = cd.conv_id "
        "WHERE p.level = 'ERROR' AND cd.team IS NOT NULL AND cd.team <> '' "
        "GROUP BY cd.team",
        "sum_items_by_team": f"{_TD}, {_PARSED_CTE} "
        "SELECT cd.team, sum(cast(regexp_extract(p.msg, 'items=(-?[0-9]+)', 1) AS bigint)) "
        "AS sum_items FROM parsed p "
        "JOIN conv_dim cd ON p.conv_id = cd.conv_id "
        "WHERE p.parse_ok AND cd.team IS NOT NULL AND cd.team <> '' GROUP BY cd.team",
        "log_dedup": f"{_T}, {_PARSED_CTE} "
        "SELECT role, level, tool, count(*) AS log_count, "
        "min(ts) AS first_observed_ts, max(ts) AS last_observed_ts "
        "FROM parsed GROUP BY role, level, tool",
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
        "SELECT conv_id, turn_idx, regexp_replace(text, 'user=[0-9]+', '****', 'g') "
        "AS redacted FROM transcripts",
    }
