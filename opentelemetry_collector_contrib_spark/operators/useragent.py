"""UserAgent converter — uap-core-style parsing, pure JVM.

The reference's UserAgent converter (pkg/ottl/ottlfuncs/func_useragent.go)
runs the embedded ua-parser database and returns exactly three semconv
keys: ``user_agent.name`` (family), ``user_agent.original`` (the raw
string), ``user_agent.version`` (major.minor.patch joined with dots,
empty components skipped — uap-go ``ToVersionString``). Unknown agents
are family ``Other`` with an empty version.

This module vendors a SUBSET of the public uap-core pattern semantics —
the ordered browser/tool families that cover the overwhelming majority
of real HTTP traffic — re-expressed as ONE chained CASE over JVM
``rlike``/``regexp_extract`` (first match wins, like ua-parser's ordered
list; no Python in the path). Families beyond the subset fall back to
``Other`` exactly like ua-parser does for agents its database misses.
Verified against the reference's own test fixtures
(func_useragent_test.go: Firefox, Chrome, Mobile Safari, Edge, Opera,
curl, unknown → Other).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["user_agent_map", "UA_PATTERNS"]

# (java_regex, family | None → captured group 1, version group numbers)
# ORDER MATTERS: first match wins. Chrome-derived browsers (Opera, Edge,
# Samsung, Yandex, Vivaldi) must precede Chrome; Chrome must precede
# Safari (Chrome UAs contain "Safari/"); Version/-based Safari detection
# must distinguish Mobile.
UA_PATTERNS: list[tuple[str, str | None, tuple[int, ...]]] = [
    (r"(OPR)/(\d+)\.(\d+)(?:\.(\d+))?", "Opera", (2, 3, 4)),
    (r"(Opera Mini)/(\d+)\.(\d+)(?:\.(\d+))?", "Opera Mini", (2, 3, 4)),
    (r"(Edge?)/(\d+)\.(\d+)(?:\.(\d+))?", "Edge", (2, 3, 4)),
    (r"(EdgiOS)/(\d+)\.(\d+)(?:\.(\d+))?", "Edge Mobile", (2, 3, 4)),
    (
        r"(SamsungBrowser)/(\d+)\.(\d+)(?:\.(\d+))?",
        "Samsung Internet",
        (2, 3, 4),
    ),
    (
        r"(YaBrowser)/(\d+)\.(\d+)(?:\.(\d+))?",
        "Yandex Browser",
        (2, 3, 4),
    ),
    (r"(Vivaldi)/(\d+)\.(\d+)(?:\.(\d+))?", None, (2, 3, 4)),
    (r"(HeadlessChrome)/(\d+)\.(\d+)(?:\.(\d+))?", None, (2, 3, 4)),
    (r"(FxiOS)/(\d+)\.(\d+)(?:\.(\d+))?", "Firefox iOS", (2, 3, 4)),
    (r"(Firefox)/(\d+)\.(\d+)(?:\.(\d+))?", None, (2, 3, 4)),
    (
        r"(CriOS)/(\d+)\.(\d+)(?:\.(\d+))?",
        "Chrome Mobile iOS",
        (2, 3, 4),
    ),
    (r"(Chromium)/(\d+)\.(\d+)(?:\.(\d+))?", None, (2, 3, 4)),
    (
        r"(Chrome)/(\d+)\.(\d+)(?:\.(\d+))?(?:\.\d+)? Mobile",
        "Chrome Mobile",
        (2, 3, 4),
    ),
    (r"(Chrome)/(\d+)\.(\d+)(?:\.(\d+))?", None, (2, 3, 4)),
    # Safari reports its version in Version/ — Mobile marker first
    (
        r"Version/(\d+)\.(\d+)(?:\.(\d+))?.* Mobile(?:/\w+)? Safari/",
        "Mobile Safari",
        (1, 2, 3),
    ),
    (r"Version/(\d+)\.(\d+)(?:\.(\d+))?.* Safari/", "Safari", (1, 2, 3)),
    (r"(MSIE) (\d+)\.(\d+)", "IE", (2, 3)),
    (r"Trident/.*rv[ :](\d+)\.(\d+)", "IE", (1, 2)),
    # crawlers
    (r"(Googlebot)/(\d+)\.(\d+)", None, (2, 3)),
    (r"(bingbot)/(\d+)\.(\d+)", None, (2, 3)),
    # programmatic clients / CLI tools
    (r"(curl)/(\d+)\.(\d+)(?:\.(\d+))?", None, (2, 3, 4)),
    (r"(Wget)/(\d+)\.(\d+)(?:\.(\d+))?", None, (2, 3, 4)),
    (
        r"(python-requests)/(\d+)\.(\d+)(?:\.(\d+))?",
        "Python Requests",
        (2, 3, 4),
    ),
    (r"(Python-urllib)/(\d+)\.(\d+)", None, (2, 3)),
    (r"(Go-http-client)/(\d+)\.(\d+)", None, (2, 3)),
    (r"(okhttp)/(\d+)\.(\d+)(?:\.(\d+))?", None, (2, 3, 4)),
    (
        r"(Apache-HttpClient)/(\d+)\.(\d+)(?:\.(\d+))?",
        None,
        (2, 3, 4),
    ),
    (r"(axios)/(\d+)\.(\d+)(?:\.(\d+))?", None, (2, 3, 4)),
    (r"(node-fetch)/(\d+)\.(\d+)(?:\.(\d+))?", None, (2, 3, 4)),
    (r"(Java)/(\d+)\.(\d+)(?:\.(\d+))?", None, (2, 3, 4)),
]


def _version(x: Column, pat: str, groups: tuple[int, ...]) -> Column:
    # ToVersionString: join major.minor.patch with '.', skipping empty
    # components (concat_ws skips nulls; unmatched groups extract '')
    parts = [
        F.nullif(F.regexp_extract(x, pat, g), F.lit("")) for g in groups
    ]
    return F.concat_ws(".", *parts)


def user_agent_map(x: Column) -> Column:
    """Compile the ordered pattern table into one CASE chain returning
    the reference's three-key map."""
    name = None
    version = None
    for pat, family, groups in UA_PATTERNS:
        cond = x.rlike(pat)
        fam = F.lit(family) if family else F.regexp_extract(x, pat, 1)
        ver = _version(x, pat, groups)
        name = F.when(cond, fam) if name is None else name.when(cond, fam)
        version = (
            F.when(cond, ver) if version is None else version.when(cond, ver)
        )
    name = name.otherwise(F.lit("Other"))
    version = version.otherwise(F.lit(""))
    return F.create_map(
        F.lit("user_agent.name"), name,
        F.lit("user_agent.original"), x,
        F.lit("user_agent.version"), version,
    )
