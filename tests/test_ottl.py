"""OTTL-lite statement corpus — `statement -> expected DataFrame` cases,
mirroring the reference's e2e statement tests (pkg/ottl/e2e/e2e_test.go)."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from opentelemetry_collector_contrib_spark.operators import ottl  # noqa: E402


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "user", "2024-01-01T00:00:00Z INFO ok", "bash", {"a": "1", "b": "xx"}),
            (2, "assistant", "freeform junk", "", {"a": "2", "b": "yyyy"}),
            (3, "system", "2024-01-01T00:00:05Z ERROR bad", "search", {"c": "3"}),
        ],
        ["id", "role", "text", "tool", "attrs"],
    )


def rows(df):
    return [r.asDict() for r in df.orderBy("id").collect()]


def test_set_literal(df):
    out = ottl.apply_statements(df, ["set(pipeline, 'logs')"])
    assert all(r["pipeline"] == "logs" for r in rows(out))


def test_set_where_gate_leaves_others_untouched(df):
    out = ottl.apply_statements(
        df, ["set(flag, 'sys') where role == 'system'"]
    )
    got = {r["id"]: r["flag"] for r in rows(out)}
    assert got == {1: None, 2: None, 3: "sys"}


def test_set_body_path_maps_to_text(df):
    out = ottl.apply_statements(df, ["set(body, ToUpperCase(body)) where id == 1"])
    got = {r["id"]: r["text"] for r in rows(out)}
    assert got[1].startswith("2024-01-01T00:00:00Z INFO OK".upper()[:20])
    assert got[2] == "freeform junk"


def test_set_nil_is_noop(df):
    out = ottl.apply_statements(df, ["set(role, nil)"])
    assert [r["role"] for r in rows(out)] == ["user", "assistant", "system"]


def test_statements_apply_in_order(df):
    out = ottl.apply_statements(
        df, ["set(x, 'first')", "set(x, Concat([x, 'second'], '-'))"]
    )
    assert all(r["x"] == "first-second" for r in rows(out))


def test_where_with_and_or_not(df):
    out = ottl.apply_statements(
        df,
        ["set(m, 'y') where (role == 'user' or role == 'system') and not (id == 3)"],
    )
    got = {r["id"]: r["m"] for r in rows(out)}
    assert got == {1: "y", 2: None, 3: None}


def test_extract_patterns_map(df):
    out = ottl.apply_statements(
        df,
        ["set(parts, ExtractPatterns(body, '^(?P<ts>[0-9]{4}-\\\\S+) (?P<lvl>[A-Z]+)'))"],
    )
    got = {r["id"]: r["parts"] for r in rows(out)}
    assert got[1] == {"ts": "2024-01-01T00:00:00Z", "lvl": "INFO"}
    assert got[2] == {}  # empty map on no-match (func_extract_patterns.go:58-61)


def test_replace_pattern(df):
    out = ottl.apply_statements(
        df, ["replace_pattern(body, '[0-9]{4}-[0-9]{2}-[0-9]{2}', 'DATE')"]
    )
    assert rows(out)[0]["text"].startswith("DATE")


def test_keep_keys_and_delete_key_on_map(df):
    out = ottl.apply_statements(df, ["keep_keys(attrs, ['a'])"])
    got = {r["id"]: r["attrs"] for r in rows(out)}
    assert got[1] == {"a": "1"} and got[3] == {}
    out2 = ottl.apply_statements(df, ["delete_key(attrs, 'b')"])
    got2 = {r["id"]: r["attrs"] for r in rows(out2)}
    assert got2[1] == {"a": "1"} and got2[3] == {"c": "3"}


def test_truncate_all(df):
    out = ottl.apply_statements(df, ["truncate_all(attrs, 1)"])
    got = {r["id"]: r["attrs"] for r in rows(out)}
    assert got[1] == {"a": "1", "b": "x"}


def test_math_and_comparison(df):
    out = ottl.apply_statements(df, ["set(v, id * 2 + 1) where id >= 2"])
    got = {r["id"]: r["v"] for r in rows(out)}
    assert got == {1: None, 2: 5, 3: 7}


def test_converters_hash_time(df):
    out = ottl.apply_statements(
        df,
        [
            "set(h, SHA256(role))",
            "set(ts2, Time(Substring(body, 0, 20), \"yyyy-MM-dd'T'HH:mm:ssX\")) "
            "where IsMatch(body, '^[0-9]{4}-')",
            "set(hr, Hour(ts2))",
        ],
    )
    r = rows(out)
    assert len(r[0]["h"]) == 64
    assert r[0]["hr"] == 0 and r[1]["hr"] is None


def test_error_mode_ignore_int_conversion(df):
    out = ottl.apply_statements(
        df, ["set(n, Int(tool))"], error_mode="ignore"
    )
    assert all(r["n"] is None for r in rows(out))


def test_unknown_converter_raises():
    with pytest.raises(ValueError, match="unknown converter"):
        ottl.compile_statement("set(x, Bogus(y))")


def test_parse_error_raises():
    with pytest.raises(ValueError):
        ottl.compile_statement("set(x, 'unterminated")


def test_merge_maps_modes(df):
    base = ["set(src, ParseKeyValue('a=9 c=7'))"]
    for mode, expect in [
        ("upsert", {"a": "9", "b": None, "c": "7"}),
        ("insert", {"a": "1", "b": None, "c": "7"}),
        ("update", {"a": "9", "b": None, "c": None}),
    ]:
        out = ottl.apply_statements(
            df, base + [f"merge_maps(attrs, src, '{mode}')"]
        )
        got = rows(out)[0]["attrs"]  # id=1 row: attrs={a:1,b:xx}
        assert got.get("a") == expect["a"], (mode, got)
        assert ("c" in got) == (expect["c"] is not None), (mode, got)
        assert got.get("b") == ("xx" if "b" in got else None)


def test_replace_match_glob(df):
    out = ottl.apply_statements(
        df, ["replace_match(role, 'sys*', 'SYSTEM')"]
    )
    got = {r["id"]: r["role"] for r in rows(out)}
    assert got == {1: "user", 2: "assistant", 3: "SYSTEM"}


def test_parse_json_converter(df):
    out = ottl.apply_statements(
        df, ["set(j, ParseJSON('{\"x\": \"1\", \"y\": \"two\"}'))"]
    )
    assert rows(out)[0]["j"] == {"x": "1", "y": "two"}


def test_type_predicates_static_resolution(df):
    out = ottl.apply_statements(
        df,
        [
            "set(s_is_str, IsString(role))",
            "set(i_is_int, IsInt(id))",
            "set(m_is_map, IsMap(attrs))",
            "set(s_is_int, IsInt(role))",
        ],
    )
    r = rows(out)[0]
    assert r["s_is_str"] is True and r["i_is_int"] is True
    assert r["m_is_map"] is True and r["s_is_int"] is False


def test_url_and_useragent_converters(spark):
    df2 = spark.createDataFrame(
        [(1, "https://ex.com/a/b?k=v",
          "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0.0.0 Safari/537.36")],
        ["id", "u", "ua"],
    )
    out = ottl.apply_statements(df2, ["set(up, URL(u))", "set(uap, UserAgent(ua))"])
    r = out.collect()[0]
    assert r["up"]["url.scheme"] == "https" and r["up"]["url.domain"] == "ex.com"
    assert r["up"]["url.path"] == "/a/b" and r["up"]["url.query"] == "k=v"
    assert r["uap"]["user_agent.name"] in ("Chrome", "Safari")
    assert r["uap"]["os.name"] == "Windows"
