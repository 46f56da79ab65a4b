"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct
(kind, declared dims, codec). The Spark-side machinery — schema,
partition sizing, Arrow batch shape, mapInPandas signatures — is real
and tested; the actual media decode is STUBBED (no image/audio libs in
this environment): `decode_features(..., impl="fake")` computes a
deterministic feature set from the raw bytes, and `impl="real"` raises
NotImplementedError at the exact point a PIL/ffmpeg call would slot in.

Scale notes:
  * Payload rows are wide (MBs); `rebalance_for_payloads` targets a
    bytes-per-partition budget instead of a row count so Arrow batches
    stay inside executor memory.
  * Feature extraction is mapInPandas over Arrow record batches — bytes
    move executor->Python once, zero-copy via Arrow; never per-row
    Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "FEATURE_SCHEMA",
    "attach_fake_payload",
    "rebalance_for_payloads",
    "decode_features",
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_entropy_proxy", T.DoubleType(), False),
        T.StructField("frame_count", T.IntegerType(), False),
    ]
)


def attach_fake_payload(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Deterministically synthesize a binary payload + metadata from text
    (UTF-8 bytes with a 4-byte magic header) — stands in for reading real
    media blobs from an object store."""
    payload = F.concat(
        F.lit(b"\x89MMA"), F.encode(F.col(text_col), "UTF-8")
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        kind.alias("kind"),
        F.lit("fake/v1").alias("codec"),
        (F.col("doc_id") % 64 * 16 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 48 * 16 + 16).cast("int").alias("height"),
        (F.length(F.col(text_col)).cast("long") * 10).alias("duration_ms"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def rebalance_for_payloads(
    df: DataFrame,
    *,
    approx_row_bytes: int,
    target_partition_bytes: int = 128 << 20,
    approx_rows: int | None = None,
) -> DataFrame:
    """Repartition so each partition holds ~target bytes of payload.

    Row-count-based partitioning breaks when rows are megabytes wide;
    this sizes partitions by a byte budget (the Arrow batch transfer and
    the Python worker's memory both scale with partition width).

    ``approx_rows`` should come from an upstream stage's lineage metrics
    (plans/lineage.partition_metrics rows) or the source table's
    statistics — an extra counting pass over a 100 TB payload table just
    to pick a partition count is the wrong trade. Only when no estimate
    exists does this fall back to one `count()` action."""
    rows = max(approx_rows if approx_rows is not None else df.count(), 1)
    parts = max(1, (rows * approx_row_bytes) // target_partition_bytes)
    return df.repartition(int(min(parts, rows)))


def _fake_decode(payload: bytes, kind: str) -> tuple[float, float, int]:
    # deterministic "decode": byte statistics + a fake frame count.
    # REAL IMPLEMENTATION SLOT: PIL.Image.open / soundfile.read /
    # av.open go here when the libs exist.
    body = payload[4:]  # strip magic
    n = len(body)
    mean = sum(body) / n if n else 0.0
    distinct = len(set(body))
    entropy_proxy = distinct / 256.0
    frames = 1 if kind == "image" else max(1, n // 100)
    return mean, entropy_proxy, frames


def decode_features(
    df: DataFrame,
    *,
    impl: str = "fake",
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Extract per-payload features via mapInPandas (Arrow-batched).

    `impl="real"` marks where a genuine media decoder plugs in; it raises
    NotImplementedError because the decode libraries are not available
    here. The surrounding plumbing (schema, batching, column pruning to
    (doc_id, payload, media_meta)) is identical for both impls.
    """
    if impl not in ("fake", "real"):
        raise ValueError(impl)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if impl == "real":
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg; not available in this "
                    "environment — use impl='fake'"
                )
            kinds = pdf["media_meta"].map(lambda m: m["kind"])
            # batch-vectorized byte statistics: payloads pad into one
            # (rows, maxlen) matrix (sentinel 256 past each row's end),
            # then mean / distinct-count / frame-count are whole-batch
            # numpy ops — the same stats _fake_decode defines per row
            bodies = [bytes(p)[4:] for p in pdf["payload"]]
            n = len(bodies)
            lens = np.fromiter((len(b) for b in bodies), dtype=np.int64, count=n)
            maxlen = int(lens.max()) if n else 0
            arr = np.full((n, max(maxlen, 1)), 256, dtype=np.uint16)
            for i, b in enumerate(bodies):
                arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
            valid = arr <= 255
            sums = np.where(valid, arr, 0).sum(axis=1)
            mean = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
            srt = np.sort(arr, axis=1)
            distinct = ((srt[:, 1:] != srt[:, :-1]) & (srt[:, 1:] <= 255)).sum(
                axis=1
            ) + (srt[:, 0] <= 255).astype(np.int64)
            frames = np.where(
                kinds.values == "image", 1, np.maximum(1, lens // 100)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "kind": kinds,
                    "n_bytes": lens + 4,
                    "byte_mean": mean,
                    "byte_entropy_proxy": distinct / 256.0,
                    "frame_count": pd.Series(frames, dtype="int32"),
                }
            )

    pruned = df.select("doc_id", "payload", "media_meta")
    return pruned.mapInPandas(run, FEATURE_SCHEMA)
