"""Sequence packing: greedy bin-packing of documents into fixed token
budgets (context windows) — the step between a cleaned corpus and
training shards.

Greedy next-fit packing is a running sum WITH RESET (a bin closes when
the next doc would overflow it), which no window function expresses —
the same non-associative shape as the recombine byte-flush. Same
Spark-first answer: shard the corpus, sort each shard's (order, doc,
tokens) array, and split it into bins with ONE JVM ``F.aggregate`` fold
(no UDF, no Python). Plan: narrow hash/projection → one shuffle on the
shard key → per-shard fold → explode. Shard count bounds per-group
array size: pick ``num_shards ≈ corpus_tokens / (budget × ~10⁴)`` so a
shard holds a few thousand docs; packing quality is unaffected because
bins never cross shards by design (shards are the unit of parallelism,
exactly like per-worker packing in a streaming loader).

A document larger than the budget gets a bin of its own (the consumer
truncates); it never silently disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    *,
    budget: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Pack rows into bins of total ``tokens_col`` ≤ ``budget``.

    Returns one row per bin: ``shard``, ``bin_idx``, ``doc_ids``
    (array, packing order), ``n_docs``, ``total_tokens``.
    """
    shard = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(num_shards))
    order = F.xxhash64(F.col(id_col), F.lit(seed + 1))
    # keep the id column's NATIVE type in the pair struct — a cast to
    # long would null out string/UUID doc ids, silently losing their
    # identities from the returned doc_ids arrays
    id_t = df.schema[id_col].dataType.simpleString()
    pair = F.struct(
        order.alias("o"),
        F.col(id_col).alias("d"),
        F.col(tokens_col).cast("long").alias("t"),
    )
    pair_t = f"struct<o:bigint,d:{id_t},t:bigint>"
    zero = F.expr(
        f"named_struct('bins', cast(array() as array<array<{pair_t}>>), "
        f"'cur', cast(array() as array<{pair_t}>), 'sz', cast(0 as bigint))"
    )

    def step(acc, x):
        # close the open bin BEFORE adding when the doc would overflow
        # it (next-fit); an oversized doc starts (and later closes) its
        # own bin rather than vanishing
        would = acc["sz"] + x["t"]
        overflow = (would > budget) & (F.size(acc["cur"]) > 0)
        cur = F.when(overflow, F.array(x)).otherwise(
            F.concat(acc["cur"], F.array(x))
        )
        return F.struct(
            F.when(overflow, F.concat(acc["bins"], F.array(acc["cur"])))
            .otherwise(acc["bins"])
            .alias("bins"),
            cur.alias("cur"),
            F.when(overflow, x["t"]).otherwise(would).alias("sz"),
        )

    def finish(acc):
        return F.when(
            F.size(acc["cur"]) > 0, F.concat(acc["bins"], F.array(acc["cur"]))
        ).otherwise(acc["bins"])

    grouped = (
        df.select(shard.alias("shard"), pair.alias("_p"))
        .groupBy("shard")
        .agg(F.array_sort(F.collect_list("_p")).alias("_ps"))
    )
    bins = F.aggregate(F.col("_ps"), zero, step, finish)
    exploded = grouped.select(
        "shard", F.posexplode(bins).alias("bin_idx", "_bin")
    )
    b = F.col("_bin")
    return exploded.select(
        "shard",
        "bin_idx",
        F.transform(b, lambda x: x["d"]).alias("doc_ids"),
        F.size(b).alias("n_docs"),
        F.aggregate(
            b, F.lit(0).cast("bigint"), lambda a, x: a + x["t"]
        ).alias("total_tokens"),
    )
