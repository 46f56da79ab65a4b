"""Grok pattern support: compile %{NAME:field} patterns to plain regex
on the driver, then run the same vectorized regex stage as regex_parser.

Reference: OTTL ``ExtractGrokPatterns`` converter backed by elastic/
go-grok (pkg/ottl/ottlfuncs/func_extract_grok_patterns.go:38-103) —
supports the default pattern dictionary plus custom definitions
(``name=regex``). The dictionary below is the commonly-used core of the
public grok base set (names and regexes as in elastic/go-grok &
logstash-patterns-core defaults).

Spark-first: grok NEVER executes per row — expansion happens once at
compile time (the analog of go-grok compiling to RE2), and the result
is a Java-regex named-group pattern handed to `regexp_extract`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from . import parsers

__all__ = ["GROK_PATTERNS", "grok_to_regex", "grok_parse"]

GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"\b[1-9]\d*\b",
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"0?[1-9]|1[0-2]",
    "MONTHDAY": r"(?:0[1-9]|[12]\d|3[01]|[1-9])",
    "HOUR": r"2[0123]|[01]?\d",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]?\d)(?:[:.,]\d+)?",
    "TIME": r"(?!<\d)%{HOUR}:%{MINUTE}(?::%{SECOND})(?![\d])",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "ISO8601_TIMEZONE": r"Z|[+-]%{HOUR}(?::?%{MINUTE})",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}"
        r"(?::?%{SECOND})?%{ISO8601_TIMEZONE}?"
    ),
    "LOGLEVEL": (
        r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|"
        r"[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|"
        r"WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|"
        r"CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|"
        r"[Ee]merg(?:ency)?"
    ),
    "IP": (
        r"(?:(?:25[0-5]|2[0-4]\d|[01]?\d{1,2})\.){3}"
        r"(?:25[0-5]|2[0-4]\d|[01]?\d{1,2})"
    ),
    "HOSTNAME": (
        r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
        r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b"
    ),
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "PATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "QUOTEDSTRING": r'"(?:[^"\\]|\\.)*"',
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "MONTH": (
        r"\bJan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|"
        r"Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|"
        r"Dec(?:ember)?\b"
    ),
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?\}")


def grok_to_regex(
    pattern: str,
    *,
    definitions: dict[str, str] | None = None,
    _depth: int = 0,
) -> str:
    """Expand %{NAME} / %{NAME:field} references into a Java-compatible
    named-group regex. Custom ``definitions`` shadow the built-ins
    (func_extract_grok_patterns.go:60-78). Recursion is bounded to catch
    cyclic definitions at compile time."""
    if _depth > 20:
        raise ValueError("grok pattern recursion too deep (cyclic definition?)")
    dictionary = {**GROK_PATTERNS, **(definitions or {})}

    def sub(m: re.Match) -> str:
        name, field = m.group(1), m.group(2)
        if name not in dictionary:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        inner = grok_to_regex(
            dictionary[name], definitions=definitions, _depth=_depth + 1
        )
        if field:
            safe = re.sub(r"\W", "_", field)
            return f"(?P<{safe}>{inner})"
        return f"(?:{inner})"

    return _GROK_REF.sub(sub, pattern)


def grok_parse(
    df: DataFrame,
    pattern: str,
    *,
    definitions: dict[str, str] | None = None,
    parse_from: str = "text",
    on_error: str = "send",
) -> DataFrame:
    """ExtractGrokPatterns as a parse stage: compile once on the driver,
    then the pure-JVM ``regexp_extract`` path (whole-stage codegen, no
    Arrow boundary). Extraction is by group INDEX from the compiled
    pattern (Java group names forbid '_', and stray unnamed capturing
    groups inside user definitions can't shift an index-based mapping),
    so the named groups are stripped to plain groups for the JVM."""
    from pyspark.sql import functions as F

    rx = grok_to_regex(pattern, definitions=definitions)
    compiled = re.compile(rx)
    if not compiled.groupindex:
        raise ValueError("grok pattern defines no named fields")
    jpattern = re.sub(r"\(\?P<[^>]+>", "(", rx)
    src = F.col(parse_from)
    # null input is a parse FAILURE (false), not null — the error
    # channel must see every row on exactly one side
    ok = src.isNotNull() & src.rlike(jpattern)
    cols = [
        F.when(ok, F.regexp_extract(src, jpattern, idx)).alias(name)
        for name, idx in sorted(compiled.groupindex.items(), key=lambda kv: kv[1])
    ]
    out = df.select("*", ok.alias("parse_ok"), *cols)
    if on_error == "drop":
        out = out.filter(F.col("parse_ok"))
    return out
