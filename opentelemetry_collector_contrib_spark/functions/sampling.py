"""Deterministic sampling + global shuffle for training-data prep.

Beyond the reference's operator set (SURVEY's training-pipeline tier):
a 100 TB corpus pipeline needs reproducible subset selection and a
reproducible global permutation before epoch writing. All three ops are
pure DataFrame plans — no RDDs, no driver-side materialization, fully
deterministic given (key column, seed):

  * ``global_shuffle`` — pseudo-random permutation by sorting on a
    seeded xxhash64 of the key: ONE range-partitioned sort (the same
    shuffle a ``repartition`` would pay), identical order on any
    cluster size, no ``rand()`` (which is per-task nondeterministic
    under retries — a silent correctness bug at scale).
  * ``exact_sample`` — exact-k uniform sample as hash-order top-k:
    TakeOrderedAndProject keeps only k rows per partition then merges
    ≤ k·partitions rows on the driver-side heap — no full sort, no
    full shuffle.
  * ``stratified_sample`` — exact k per stratum via row_number over
    the hash order within each stratum (one shuffle on the stratum
    key), or fraction-based via deterministic hash thresholding (ZERO
    shuffle — a narrow filter, unlike ``DataFrame.sampleBy`` whose
    Bernoulli draw is not retry-stable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["global_shuffle", "exact_sample", "stratified_sample"]


def _hash_order(key: Column, seed: int) -> Column:
    # xxhash64 is the JVM-side seeded hash; stable across partitions,
    # retries, and cluster sizes
    return F.xxhash64(key, F.lit(seed))


def global_shuffle(
    df: DataFrame, key: str, *, seed: int = 0, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic global permutation: sort by seeded hash of ``key``.
    Different seeds give independent epoch orders; re-running a failed
    job reproduces the identical order (rand() would not)."""
    h = _hash_order(F.col(key), seed)
    if num_partitions:
        out = df.repartitionByRange(num_partitions, h)
    else:
        out = df.repartitionByRange(h)
    return out.sortWithinPartitions(h)


def exact_sample(
    df: DataFrame,
    k: int,
    key: str,
    *,
    seed: int = 0,
    large_k: bool = False,
    est_total: int | None = None,
    num_partitions: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Exact-k uniform-without-replacement sample = first k rows of the
    seeded hash order.

    Default path compiles to TakeOrderedAndProject: partition-local
    top-k, then a driver heap merge of ≤ k·partitions rows — right for
    sampling-sized k, wrong for epoch-scale k (tens of millions), where
    the driver merge alone would hold k·partitions rows.

    ``large_k=True`` is the scale path and never funnels more than one
    row per *partition* through the driver:

      1. hash-threshold pre-filter: keep rows whose hash-uniform value
         is below p = (k + 6·√k + 16)/N — a NARROW filter that passes
         ~k(1+ε) rows and, by a Chernoff bound, keeps ≥ k of the true
         top-k with overwhelming probability;
      2. range-partition the ~k survivors by hash (the only shuffle,
         sized by the sample not the corpus);
      3. exact trim to rank ≤ k via per-partition offsets (the
         zipWithIndex construction): per-partition counts (≤ P rows on
         the driver) + row_number within each range partition.

    ``est_total`` skips the initial count when the caller already knows
    N (e.g. from lineage).  If the pre-filter ever yields fewer than k
    survivors (p margin missed — astronomically unlikely), falls back
    to the exact top-k path for correctness.

    The survivor frame stays persisted for the returned DataFrame's
    lifetime (the per-partition counts and the rank job must see one
    layout); it is sample-sized (~k rows). ``materialize=True`` is the
    epoch-loop mode: it eagerly computes the trimmed sample into a
    ``localCheckpoint`` (truncating lineage off the cached parent) and
    unpersists the survivor frame before returning, so repeated
    per-epoch sampling in a long-lived session leaves no accumulated
    cache behind — the checkpointed sample itself is released by
    Spark's ContextCleaner when the caller drops the DataFrame.
    """
    def _finish(out: DataFrame) -> DataFrame:
        # materialize applies on EVERY path (small-k, degenerate k>=n,
        # and the large-k fallback too) — a config-pipeline epoch loop
        # that asks for an eager boundary must get one regardless of
        # which branch the sizes selected
        return out.localCheckpoint(eager=True) if materialize else out

    h = _hash_order(F.col(key), seed)
    if not large_k:
        return _finish(df.orderBy(h).limit(k))

    import math

    n = est_total if est_total is not None else df.count()
    if k >= n:
        return _finish(df)
    p = min(1.0, (k + 6.0 * math.sqrt(k) + 16.0) / n)
    u = (h.cast("double") / F.lit(float(2**64))) + F.lit(0.5)
    surv = df.filter(u < F.lit(p))
    num_p = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    # persist so the counts job and the rank job see the same layout
    ranged = (
        surv.repartitionByRange(int(num_p), h, F.col(key))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["count"] for r in ranged.groupBy("_pid").count().collect()}
    if sum(counts.values()) < k:
        ranged.unpersist()
        return _finish(df.orderBy(h).limit(k))
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    w = Window.partitionBy("_pid").orderBy(h, F.col(key))
    out = (
        ranged.withColumn("_rank", off_map[F.col("_pid")] + F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_pid", "_rank")
    )
    if materialize:
        out = out.localCheckpoint(eager=True)
        ranged.unpersist()
    return out


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    *,
    k: int | None = None,
    fractions: dict | None = None,
    key: str,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum sampling, deterministic under retries.

    ``k``: exact k rows per stratum — row_number over the seeded hash
    order within each stratum (one shuffle on ``strata_col``).
    ``fractions``: {stratum: fraction} — hash-threshold filter, a
    NARROW op with zero shuffle: a row survives when its seeded hash
    (mapped to [0,1)) falls under its stratum's fraction. Strata absent
    from the dict are dropped (DataFrame.sampleBy semantics).
    """
    if (k is None) == (fractions is None):
        raise ValueError("exactly one of k / fractions")
    h = _hash_order(F.col(key), seed)
    if k is not None:
        w = Window.partitionBy(strata_col).orderBy(h)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
    # map the signed 64-bit hash to [0, 1)
    u = (h.cast("double") / F.lit(float(2**64))) + F.lit(0.5)
    frac = None
    for stratum, f in fractions.items():
        c = F.col(strata_col) == stratum
        frac = F.when(c, F.lit(float(f))) if frac is None else frac.when(
            c, F.lit(float(f))
        )
    frac = frac.otherwise(F.lit(0.0)) if frac is not None else F.lit(0.0)
    return df.filter(u < frac)
