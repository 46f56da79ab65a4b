"""Stateful streaming recombine via applyInPandasWithState.

Reference: transformer/recombine/transformer.go:25-232 — per-source
batches keyed by source_identifier, boundary marked by is_last_entry,
flush on match / force_flush_timeout. The batch implementation
(operators/transformers.py:recombine) is a window+groupBy; this is the
streaming twin: Spark keyed state holds the open block per conversation,
`is_last` flushes it, and a processing-time timeout force-flushes
stragglers (transformer.go:60-83).

State is O(open block) per key — bounded by conversation length, not
stream length. Keys shard across executors by hash(conv_id); hot
conversations are bounded by the same argument as the batch path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["recombine_stream", "RECOMBINE_OUTPUT_SCHEMA"]

RECOMBINE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_combined", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("orders", T.ArrayType(T.IntegerType()), True),
        T.StructField("texts", T.ArrayType(T.StringType()), True),
    ]
)


def recombine_stream(
    df: DataFrame,
    *,
    source_col: str = "conv_id",
    order_col: str = "turn_idx",
    combine_field: str = "text",
    is_last_col: str = "is_last",
    combine_with: str = "\n",
    flush_timeout_ms: int | None = None,
) -> DataFrame:
    """Merge turns into blocks ending at rows where ``is_last_col`` is
    true. Incomplete blocks PERSIST in the state store across runs —
    with ``flush_timeout_ms`` set they emit once a later micro-batch
    observes the processing-time timeout; without it (and at job end
    under availableNow) they simply stay open until a subsequent run
    completes or times them out, mirroring the recombine operator's
    in-memory batches surviving until forceFlushTimeout."""

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            orders, texts = state.get
            state.remove()
            if orders:
                pairs = sorted(zip(orders, texts))
                yield pd.DataFrame(
                    {
                        "conv_id": [key[0]],
                        "turn_idx": [pairs[0][0]],
                        "text": [combine_with.join(t for _, t in pairs)],
                        "n_combined": [len(pairs)],
                    }
                )
            return

        orders, texts = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        out: list[tuple[str, int, str, int]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            for o, t, last in zip(
                pdf[order_col], pdf[combine_field], pdf[is_last_col]
            ):
                orders.append(int(o))
                texts.append(t if t is not None else "")
                if last:
                    pairs = sorted(zip(orders, texts))
                    out.append(
                        (
                            key[0],
                            pairs[0][0],
                            combine_with.join(t for _, t in pairs),
                            len(pairs),
                        )
                    )
                    orders, texts = [], []
        state.update((orders, texts))
        if flush_timeout_ms:
            state.setTimeoutDuration(flush_timeout_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "text", "n_combined"]
            )

    return df.groupBy(source_col).applyInPandasWithState(
        fn,
        outputStructType=RECOMBINE_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
