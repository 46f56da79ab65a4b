"""filelog-style raw text source: glob-read lines, attach file attrs,
optionally recombine multiline records.

Reference mapping (SURVEY §2.1):
  * glob-match + tail      -> ``spark.read.text(paths)`` (batch) /
    ``spark.readStream.text`` (the streaming module's file source keeps
    its own offset log = fingerprint+offset checkpointing)
  * log.file.name/path     -> ``_metadata.file_path`` per row
    (fileconsumer/attrs/attrs.go:37-70)
  * multiline split        -> start/end regex marks record boundaries
    (fileconsumer/config.go:84 ``split.Config``); the recombine stage
    merges continuation lines exactly like the stanza splitter joins
    them before emission.

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

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_text_logs"]


def read_text_logs(
    spark: SparkSession,
    paths: str | list[str],
    *,
    multiline_start: str | None = None,
    multiline_end: str | None = None,
    combine_with: str = "\n",
) -> DataFrame:
    """Read raw log lines with file attributes; with a multiline
    start/end pattern, continuation lines merge into one record.

    Returns columns: ``text``, ``log_file_path``, ``log_file_name``
    (+ ``n_combined`` when a multiline pattern is set).
    """
    if isinstance(paths, str):
        paths = [paths]
    df = (
        spark.read.text(*paths)
        .select(
            F.col("value").alias("text"),
            F.col("_metadata.file_path").alias("log_file_path"),
            F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
                "log_file_name"
            ),
            F.monotonically_increasing_id().alias("_line_id"),
        )
    )
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
    return out.select(
        "text",
        F.col("log_file_path"),
        F.element_at(F.split(F.col("log_file_path"), "/"), -1).alias(
            "log_file_name"
        ),
        "n_combined",
    )
