"""filelog-style raw text source: glob-read lines, attach file attrs,
optionally recombine multiline records.

Reference mapping (SURVEY §2.1):
  * glob-match + tail      -> ``spark.read.text(paths)`` (batch) /
    ``spark.readStream.text`` (the streaming module's file source keeps
    its own offset log = fingerprint+offset checkpointing)
  * include/exclude globs  -> driver-side file-list expansion, include
    minus exclude (fileconsumer/matcher + config.go:73-92) — the
    reference's finder also walks the filesystem per poll; file LISTING
    is driver-scale work (file count, not data size)
  * log.file.name/path     -> ``_metadata.file_path`` per row
    (fileconsumer/attrs/attrs.go:37-70)
  * charset decode         -> non-UTF-8 encodings route through the CSV
    reader's charset decoder with quoting/delimiting disabled (the text
    source is UTF-8-only); pkg/stanza/decode/decoder.go
  * start_at: end          -> snapshot watermark: ``snapshot_offsets``
    records per-file line counts; a later read skips lines at or below
    the recorded count (fileconsumer/config.go start_at semantics for a
    batch replay)
  * header metadata        -> a header line at file start parsed into
    per-file attributes attached to every record and dropped from the
    record stream (fileconsumer/internal/header/)
  * multiline split        -> start/end regex marks record boundaries
    (fileconsumer/config.go:84 ``split.Config``); the recombine stage
    merges continuation lines exactly like the stanza splitter joins
    them before emission.
  * gzip'd rotated files   -> transparent (Hadoop codec by extension);
    covered by test_textlogs gzip case.

Line ordering: a log FILE is a sequential stream, so per-file order is
the record order. ``monotonically_increasing_id`` is increasing within
each scan partition and the text source reads each file split in file
order — valid while one file maps into one split (log files <
``spark.sql.files.maxPartitionBytes``, the normal case for rotated
logs). Files larger than a split should be ingested via the streaming
path or pre-split at rotation boundaries; this mirrors the reference,
where one reader goroutine owns one file.
"""

from __future__ import annotations

import glob as _glob
import re

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

__all__ = ["read_text_logs", "expand_paths", "snapshot_offsets"]


def expand_paths(
    include: list[str], exclude: list[str] | None = None
) -> list[str]:
    """include minus exclude file-glob expansion
    (fileconsumer/config.go:73-92; matcher uses doublestar globs — ``**``
    maps to Python glob recursive mode). Both sides expand through the
    SAME glob engine and subtract as file sets, so ``*`` never matches
    across ``/`` the way a naive fnmatch would. Local-filesystem paths;
    remote stores should pre-resolve their listing the same way."""
    files: set[str] = set()
    for pat in include:
        files.update(_glob.glob(pat, recursive=True))
    excluded: set[str] = set()
    for pat in exclude or []:
        excluded.update(_glob.glob(pat, recursive=True))
    return sorted(files - excluded)


def snapshot_offsets(
    spark: SparkSession,
    paths: str | list[str],
    *,
    encoding: str | None = None,
) -> dict:
    """Record the current per-file line counts — the batch analog of the
    reader's stored fingerprint+offset. Feed the result to
    ``read_text_logs(start_at="end", snapshot=...)`` to read only lines
    appended after this snapshot.

    Pass the SAME ``encoding`` as the later read: the charset path rides
    the CSV reader, which (unlike the text source) skips blank lines, so
    counting through a different reader would misalign the watermark."""
    if isinstance(paths, str):
        paths = [paths]
    rows = (
        _read_lines(spark, paths, encoding)
        .groupBy(F.col("_path").alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["p"]: r["n"] for r in rows}


#: charsets whose code units span multiple bytes: byte-level line
#: splitting would cut characters in half, so these decode whole files
_MULTIBYTE = {
    "utf-16", "utf-16le", "utf-16be", "utf-32", "utf-32le", "utf-32be",
    "utf16", "utf32",
}


def _read_lines(
    spark: SparkSession, paths: list[str], encoding: str | None
) -> DataFrame:
    """Normalized line reader: columns ``value`` (one log line),
    ``_path``, ``_line_id`` (per-file ascending order key)."""
    if encoding is None or encoding.lower() in ("utf-8", "utf8"):
        src = spark.read.text(paths)
        return src.select(
            "value",
            F.col("_metadata.file_path").alias("_path"),
            F.monotonically_increasing_id().alias("_line_id"),
        )
    if encoding.lower().replace("_", "-") in _MULTIBYTE:
        # multi-byte charsets (pkg/stanza/decode/decoder.go handles these
        # via a streaming decoder): Hadoop's record reader splits on RAW
        # bytes, which would shear UTF-16/32 code units — decode each
        # WHOLE file JVM-side (binaryFile source) and split lines after.
        # One row per file pre-explode: sized for rotated log files, the
        # same unit the reference's one-reader-per-file model assumes.
        raw = spark.read.format("binaryFile").load(paths)
        # whole-file decode means one file = one executor row: a multi-GB
        # UTF-16 file would OOM an executor silently. Fail loudly instead
        # (the filelog model reads rotated-log-sized files; repack bigger
        # inputs or transcode to UTF-8 upstream).
        budget = int(
            spark.conf.get("spark.graft.charset.maxFileBytes", str(256 << 20))
        )
        too_big = [
            (r["path"], r["length"])
            for r in raw.select("path", "length")
            .filter(F.col("length") > budget)
            .collect()
        ]
        if too_big:
            worst = ", ".join(f"{p} ({n >> 20} MiB)" for p, n in too_big[:3])
            raise ValueError(
                f"{len(too_big)} {encoding} file(s) exceed the whole-file "
                f"decode budget of {budget >> 20} MiB (e.g. {worst}). "
                "Multi-byte charsets decode one file per executor row; "
                "raise spark.graft.charset.maxFileBytes only if executors "
                "have the memory, or transcode to UTF-8."
            )
        txt = F.decode(F.col("content"), encoding)
        lines = F.split(F.regexp_replace(txt, "\r?\n$", ""), "\r?\n")
        return raw.select(
            F.col("path").alias("_path"),
            F.posexplode(lines).alias("_line_id", "value"),
        ).select("value", "_path", "_line_id")
    # single-byte ASCII-superset charsets ride the CSV reader's decoder
    # (splittable, scales to any file size) with quoting and delimiting
    # disabled — NUL as quote char disables quote handling, SOH as
    # separator keeps each physical line one column (log lines don't
    # carry those bytes). DOCUMENTED DIVERGENCE: the CSV reader skips
    # blank lines, so empty log lines are dropped on this path;
    # snapshot_offsets(encoding=...) counts through this same reader so
    # start_at=end watermarks stay aligned.
    src = (
        spark.read.format("csv")
        .option("charset", encoding)
        .option("quote", "\u0000")
        .option("sep", "\u0001")
        .schema("value string")
        .load(paths)
    )
    return src.select(
        "value",
        F.col("_metadata.file_path").alias("_path"),
        F.monotonically_increasing_id().alias("_line_id"),
    )


def read_text_logs(
    spark: SparkSession,
    paths: str | list[str],
    *,
    exclude: list[str] | None = None,
    encoding: str | None = None,
    start_at: str = "beginning",
    snapshot: dict | None = None,
    header_pattern: str | None = None,
    multiline_start: str | None = None,
    multiline_end: str | None = None,
    combine_with: str = "\n",
) -> DataFrame:
    """Read raw log lines with file attributes; with a multiline
    start/end pattern, continuation lines merge into one record.

    Returns columns: ``text``, ``log_file_path``, ``log_file_name``
    (+ named header groups when ``header_pattern`` is set,
    + ``n_combined`` when a multiline pattern is set).

    ``header_pattern`` is a regex with named groups matched against each
    file's FIRST line: matching header lines are removed from the record
    stream and their groups attached to every record of that file
    (fileconsumer/internal/header/). ``start_at="end"`` with a
    ``snapshot`` from :func:`snapshot_offsets` emits only lines appended
    since the snapshot.
    """
    if isinstance(paths, str):
        paths = [paths]
    if exclude:
        paths = expand_paths(paths, exclude)
        if not paths:
            raise ValueError("include minus exclude matched no files")
    df = _read_lines(spark, paths, encoding).select(
        F.col("value").alias("text"),
        F.col("_path").alias("log_file_path"),
        F.element_at(F.split(F.col("_path"), "/"), -1).alias("log_file_name"),
        "_line_id",
    )
    needs_lineno = header_pattern is not None or (
        start_at == "end" and snapshot is not None
    )
    if needs_lineno:
        w = Window.partitionBy("log_file_path").orderBy("_line_id")
        df = df.withColumn("_lineno", F.row_number().over(w))
    header_cols: list[str] = []
    if header_pattern is not None:
        # use the compiled pattern's actual group numbers: a pattern
        # mixing unnamed groups with named ones (e.g. '(#+)(?P<env>\w+)')
        # would otherwise extract the wrong group for each name
        gidx = re.compile(header_pattern).groupindex
        groups = sorted(gidx, key=gidx.get)
        if not groups:
            raise ValueError("header_pattern needs named capture groups")
        jpat = header_pattern.replace("(?P<", "(?<")
        headers = (
            df.filter((F.col("_lineno") == 1) & F.col("text").rlike(jpat))
            .select(
                "log_file_path",
                *[
                    F.regexp_extract("text", jpat, gidx[g]).alias(g)
                    for g in groups
                ],
                F.lit(True).alias("_has_header"),
            )
        )
        # per-file header attrs: one row per file -> broadcast join back
        df = df.join(F.broadcast(headers), on="log_file_path", how="left")
        df = df.filter(
            ~(F.coalesce(F.col("_has_header"), F.lit(False)) & (F.col("_lineno") == 1))
        ).drop("_has_header")
        header_cols = groups
    if start_at == "end" and snapshot is not None:
        entries = [
            F.struct(F.lit(p).alias("p"), F.lit(n).alias("n"))
            for p, n in snapshot.items()
        ]
        if entries:
            snap_map = F.map_from_entries(F.array(*entries))
            known = F.coalesce(
                snap_map[F.col("log_file_path")], F.lit(0)
            )
            df = df.filter(F.col("_lineno") > known)
    df = df.drop("_lineno") if needs_lineno else df
    if multiline_start is None and multiline_end is None:
        return df.drop("_line_id")
    from ..operators.transformers import recombine

    kw = {}
    if multiline_start is not None:
        kw["is_first"] = F.col("text").rlike(multiline_start)
    else:
        kw["is_last"] = F.col("text").rlike(multiline_end)
    out = recombine(
        df,
        source_col="log_file_path",
        order_col="_line_id",
        combine_field="text",
        combine_with=combine_with,
        **kw,
    )
    # re-attach the name (recombine keeps only source/order/text/count)
    attach = out
    if header_cols:
        hdr = df.select("log_file_path", *header_cols).dropDuplicates(
            ["log_file_path"]
        )
        attach = out.join(F.broadcast(hdr), on="log_file_path", how="left")
    return attach.select(
        "text",
        F.col("log_file_path"),
        F.element_at(F.split(F.col("log_file_path"), "/"), -1).alias(
            "log_file_name"
        ),
        *header_cols,
        "n_combined",
    )
