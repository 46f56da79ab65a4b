"""pdata-level processors: attributes actions, enrichment join, filter,
groupbyattrs, logdedup, redaction.

These correspond to the collector's processor/ components (SURVEY.md §2.5);
each is a declarative DataFrame stage.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast

__all__ = [
    "attr_insert",
    "attr_update",
    "attr_upsert",
    "attr_delete",
    "attr_hash",
    "attr_extract",
    "attr_convert",
    "enrich_lookup",
    "filter_logs",
    "group_by_attrs",
    "log_dedup",
    "redact",
]


# ---------------------------------------------------------------------------
# attributes / resource processor — action list semantics
# (internal/coreinternal/attraction/attraction.go:22-88, exec :287-342)
# ---------------------------------------------------------------------------

def attr_insert(
    df: DataFrame, key: str, value, *, where: Column | None = None
) -> DataFrame:
    """INSERT: set only if the attribute is absent/null (attraction.go:296).

    ``where`` = the processor's include/exclude match properties
    (attributesprocessor filterspan gating): rows failing the predicate
    pass through unmodified. Same parameter on the other actions."""
    v = value if isinstance(value, Column) else F.lit(value)
    if key in df.columns:
        new = F.coalesce(F.col(key), v)
        old = F.col(key)
    else:
        new = v
        old = F.lit(None).cast("string")
    if where is not None:
        new = F.when(where, new).otherwise(old)
    return df.withColumn(key, new)


def attr_update(df: DataFrame, key: str, value) -> DataFrame:
    """UPDATE: set only if the attribute already exists (attraction.go:301)."""
    if key not in df.columns:
        return df
    v = value if isinstance(value, Column) else F.lit(value)
    return df.withColumn(key, F.when(F.col(key).isNotNull(), v).otherwise(F.col(key)))


def attr_upsert(
    df: DataFrame, key: str, value, *, where: Column | None = None
) -> DataFrame:
    """UPSERT: unconditional set (attraction.go:306)."""
    v = value if isinstance(value, Column) else F.lit(value)
    if where is not None:
        old = F.col(key) if key in df.columns else F.lit(None).cast("string")
        v = F.when(where, v).otherwise(old)
    return df.withColumn(key, v)


def attr_delete(df: DataFrame, *keys: str) -> DataFrame:
    """DELETE (attraction.go:311)."""
    return df.drop(*keys)


def attr_hash(df: DataFrame, key: str, *, algo: str = "sha256") -> DataFrame:
    """HASH: replace value with hex digest (attraction.go:316, sha1/sha256)."""
    c = F.col(key).cast("string")
    if algo == "sha1":
        h = F.sha1(c)
    elif algo == "sha256":
        h = F.sha2(c, 256)
    elif algo == "md5":
        h = F.md5(c)
    else:
        raise ValueError(f"unsupported hash algo {algo}")
    return df.withColumn(key, F.when(F.col(key).isNotNull(), h))


def attr_extract(df: DataFrame, key: str, pattern: str, groups: list[str]) -> DataFrame:
    """EXTRACT: regex named groups from one attr fan out into new attrs
    (attraction.go:414-434). No-match => nulls, source kept."""
    src = F.col(key)
    ok = src.rlike(pattern)
    out = df
    for i, g in enumerate(groups):
        out = out.withColumn(g, F.when(ok, F.regexp_extract(src, pattern, i + 1)))
    return out


def attr_convert(df: DataFrame, key: str, to: str) -> DataFrame:
    """CONVERT: type coercion (attraction.go:330-342)."""
    spark_type = {"int": "long", "double": "double", "string": "string"}[to]
    return df.withColumn(key, F.col(key).cast(spark_type))


# ---------------------------------------------------------------------------
# k8sattributes-style enrichment: broadcast lookup join + insert-if-absent
# ---------------------------------------------------------------------------

def enrich_lookup(
    df: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    insert_if_absent: bool = True,
    key_regex: str | None = None,
    key_template: str | None = None,
) -> DataFrame:
    """Enrichment lookup (processor/k8sattributesprocessor/processor.go:121-194).

    The informer cache becomes a *broadcast* dimension — the join never
    shuffles the fact side, which is the only strategy that survives a
    100 TB fact table. ``setResourceAttribute`` is insert-if-absent
    (processor.go:189-194): existing non-null fact columns win via
    ``coalesce``.

    Join keys equal to '' are treated as missing (no lookup), matching
    the reference's skip-on-empty-identifier behavior.

    ``key_regex`` selects WHICH dimension columns attach — the
    label/annotation ``key_regex`` extraction rules
    (k8sattributesprocessor/config.go:131+): only dim columns fully
    matching the regex are joined; the rest are never even broadcast
    (column pruning reaches the dim scan). ``key_template`` renames the
    attached columns the way extraction rules name their tags (the
    ``k8s.pod.labels.%s`` default): ``{key}`` expands to the matched
    column name, ``{1}``/``{2}`` to the key_regex capture groups.
    """
    if key_regex is not None:
        rx = re.compile(key_regex)
        keep = [c for c in dim.columns if c == on or rx.fullmatch(c)]
        dim = dim.select(*keep)
        if key_template is not None:
            for c in keep:
                if c == on:
                    continue
                m = rx.fullmatch(c)
                dim = dim.withColumnRenamed(
                    c, key_template.format(c, *m.groups(), key=c)
                )
    overlap = [c for c in dim.columns if c != on and c in df.columns]
    dim_renamed = dim
    for c in overlap:
        dim_renamed = dim_renamed.withColumnRenamed(c, f"_dim_{c}")
    joined = df.join(
        broadcast(dim_renamed),
        on=(df[on] == dim_renamed[on]) & (df[on] != F.lit("")),
        how="left",
    ).drop(dim_renamed[on])
    if insert_if_absent:
        for c in overlap:
            joined = joined.withColumn(
                c, F.coalesce(F.col(c), F.col(f"_dim_{c}"))
            ).drop(f"_dim_{c}")
    else:
        for c in overlap:
            joined = joined.withColumn(c, F.col(f"_dim_{c}")).drop(f"_dim_{c}")
    return joined


# gopsutil arch strings -> semconv host.arch values
# (processor/resourcedetectionprocessor/internal/system/internal provider
# maps uname machine to the OTel enum; same table here)
_SEMCONV_ARCH = {
    "x86_64": "amd64",
    "amd64": "amd64",
    "aarch64": "arm64",
    "arm64": "arm64",
    "i386": "x86",
    "i686": "x86",
    "armv7l": "arm32",
    "armv6l": "arm32",
    "ppc64": "ppc64",
    "ppc64le": "ppc64le",
    "s390x": "s390x",
}


def detect_system(
    hostname_sources: tuple[str, ...] = ("dns", "os"),
    with_host_id: bool = False,
) -> dict[str, str]:
    """The resourcedetection ``system`` detector
    (processor/resourcedetectionprocessor/internal/system/system.go:83-160):
    probe the environment ONCE at startup on the driver and return the
    semconv resource attributes to stamp.  Sources are tried in order
    exactly like the reference's ``hostname_sources`` cascade ("dns"
    resolves the FQDN, "os" takes the kernel hostname); ``os.type`` uses
    the conventions enum (linux/windows/darwin), ``host.arch`` the
    semconv arch table, ``os.description`` a human-readable platform
    string.  ``host.id`` (opt-in, like the reference's disabled-by-
    default resource_attributes.host.id) reads /etc/machine-id on Linux.

    Feed the result to :func:`resource_detect`, which applies the
    processor's default override=false (insert-if-absent) semantics.
    """
    import platform
    import socket

    attrs: dict[str, str] = {}
    hostname = None
    for source in hostname_sources:
        if source == "dns":
            fqdn = socket.getfqdn()
            # getfqdn falls back to the bare hostname; the reference's
            # dns source fails over to "os" when lookup adds nothing
            if fqdn and "." in fqdn:
                hostname = fqdn
                break
        elif source == "os":
            name = socket.gethostname()
            if name:
                hostname = name
                break
        elif source == "lookup":  # reference: reverse-lookup of host IP
            try:
                hostname = socket.gethostbyaddr(socket.gethostname())[0]
                break
            except OSError:
                continue
    if hostname:
        attrs["host.name"] = hostname
    system = platform.system().lower()  # Linux -> linux, like goruntime
    if system:
        attrs["os.type"] = system
    machine = platform.machine().lower()
    if machine:
        attrs["host.arch"] = _SEMCONV_ARCH.get(machine, machine)
    desc = platform.platform()
    if desc:
        attrs["os.description"] = desc
    if with_host_id:
        try:
            with open("/etc/machine-id", encoding="ascii") as f:
                attrs["host.id"] = f.read().strip()
        except OSError:
            pass  # reference logs a warning and omits the attr
    return attrs


def detect_env() -> dict[str, str]:
    """The resourcedetection ``env`` detector
    (processor/resourcedetectionprocessor/internal/env/env.go): parse
    ``OTEL_RESOURCE_ATTRIBUTES`` as comma-separated ``key=value`` pairs
    (W3C Baggage-style, values URL-decoded)."""
    import os
    import urllib.parse

    raw = os.environ.get("OTEL_RESOURCE_ATTRIBUTES", "")
    attrs: dict[str, str] = {}
    for pair in raw.split(","):
        pair = pair.strip()
        if not pair or "=" not in pair:
            continue
        k, v = pair.split("=", 1)
        attrs[k.strip()] = urllib.parse.unquote(v.strip())
    return attrs


#: named detectors, reference registry
#: (processor/resourcedetectionprocessor/factory.go detector list; the
#: cloud-provider detectors are meaningless off-cloud and out of scope)
DETECTORS = {"system": detect_system, "env": detect_env}


def resolve_detectors(names: list[str]) -> dict[str, str]:
    """Run named detectors in order; FIRST detector to set a key wins,
    matching the reference's merge (internal/resourcedetection.go:
    earlier detectors take precedence, later only fill absents)."""
    out: dict[str, str] = {}
    for name in names:
        try:
            probe = DETECTORS[name]
        except KeyError:
            raise ValueError(
                f"unknown detector {name!r}; have {sorted(DETECTORS)}"
            ) from None
        for k, v in probe().items():
            out.setdefault(k, v)
    return out


def resource_detect(df: DataFrame, detectors: dict[str, str]) -> DataFrame:
    """resourcedetectionprocessor (processor/resourcedetectionprocessor/):
    environment metadata detected ONCE at startup and stamped onto every
    record. Driver-side values -> literal columns (zero per-row cost;
    constant-folded by Catalyst). Existing non-null values win, matching
    the processor's default override=false."""
    out = df
    for k, v in detectors.items():
        if k in out.columns:
            # semconv names are dotted (host.name) — backtick-quote so
            # F.col doesn't parse a struct path
            ref = F.col(f"`{k}`")
            out = out.withColumn(k, F.coalesce(ref, F.lit(v)))
        else:
            out = out.withColumn(k, F.lit(v))
    return out


def filter_logs(df: DataFrame, *conditions: Column) -> DataFrame:
    """filterprocessor (processor/filterprocessor/logs.go:68-99): DROP rows
    matching ANY condition (conditions are OR'd)."""
    drop = None
    for c in conditions:
        drop = c if drop is None else (drop | c)
    return df.filter(~F.coalesce(drop, F.lit(False)))


def group_by_attrs(df: DataFrame, keys: list[str]) -> DataFrame:
    """groupbyattrsprocessor (processor/groupbyattrsprocessor/processor.go:63-100):
    regroup records under a new resource identity.  In the flat Spark model
    the 'regrouping' is a physical repartition on the promoted keys — the
    compaction benefit the processor provides is what a shuffle already
    does. Downstream per-key stages then see co-located data."""
    return df.repartition(*keys)


def log_dedup(
    df: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "ts",
    exclude: list[str] | None = None,
) -> DataFrame:
    """logdedupprocessor (processor/logdedupprocessor/processor.go:85-133):
    collapse rows equal on (body, severity, attrs) minus ``exclude``;
    emit one row with log_count + first/last timestamps.

    Map-side partial aggregation makes this cheap even with high dup
    factors; the shuffle carries one row per distinct key per partition.
    """
    keys = [k for k in key_cols if not exclude or k not in exclude]
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("log_count"),
        F.min(ts_col).alias("first_observed_ts"),
        F.max(ts_col).alias("last_observed_ts"),
    )


def redact(
    df: DataFrame,
    *,
    allowed_keys: list[str] | None = None,
    mask_patterns: dict[str, str] | None = None,
    mask_cols: list[str] | None = None,
    summary: str | None = None,
) -> DataFrame:
    """redactionprocessor (processor/redactionprocessor/processor.go:29-47):
    drop non-allowed attribute columns; mask values matching deny regexes
    with ``****`` (blocked-value masking, processor.go:193+).

    ``summary`` attaches the processor's summary attributes
    (processor.go:320-340): ``redaction.masked.count``/``.keys`` for
    values actually changed by masking (per row), and
    ``redaction.redacted.count``/``.keys`` for dropped columns (static
    per config in the promoted-column model). "debug" emits keys and
    counts, "info" counts only — all computed in the same projection,
    no extra pass."""
    out = df
    redacted_cols: list[str] = []
    if allowed_keys is not None:
        redacted_cols = sorted(c for c in out.columns if c not in allowed_keys)
        out = out.select(*[c for c in out.columns if c in allowed_keys])
    flags: list[tuple[str, F.Column]] = []
    masked_exprs: dict[str, F.Column] = {}
    if mask_patterns:
        # a mask target already dropped by allowed_keys simply doesn't
        # exist to mask (reference proceeds; no unresolved-column error)
        targets = [
            c
            for c in (mask_cols or [c for c, t in out.dtypes if t == "string"])
            if c in out.columns
        ]
        for col in targets:
            orig = F.col(col)
            v = orig
            for _name, pat in mask_patterns.items():
                v = F.regexp_replace(v, pat, "****")
            masked_exprs[col] = v
            flags.append((col, orig.isNotNull() & (v != orig)))
    # summary columns MUST be computed in the same projection as the
    # masking (the flags compare original vs masked values)
    extra: list[F.Column] = []
    if summary in ("debug", "info"):
        masked_count = (
            sum((f.cast("int") for _, f in flags), F.lit(0)) if flags else F.lit(0)
        )
        extra.append(masked_count.alias("redaction.masked.count"))
        extra.append(F.lit(len(redacted_cols)).alias("redaction.redacted.count"))
        if summary == "debug":
            masked_keys = (
                F.concat_ws(
                    ",",
                    *[F.when(f, F.lit(name)) for name, f in sorted(flags, key=lambda x: x[0])],
                )
                if flags
                else F.lit("")
            )
            extra.append(masked_keys.alias("redaction.masked.keys"))
            extra.append(
                F.lit(",".join(redacted_cols)).alias("redaction.redacted.keys")
            )
    if masked_exprs or extra:
        out = out.select(
            *[masked_exprs.get(c, F.col(c)).alias(c) for c in out.columns], *extra
        )
    return out
