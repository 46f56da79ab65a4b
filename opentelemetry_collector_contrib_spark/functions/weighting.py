"""DSIR-style importance weighting and resampling: score raw-corpus
documents by how target-like their hashed n-gram distribution is, then
sample proportionally.

Data Selection with Importance Resampling (Xie et al. 2023, NeurIPS —
public method): fit bag-of-hashed-n-gram models on a small TARGET set
(the distribution you want more of) and on the RAW corpus, weight each
raw document by its log likelihood ratio, and resample with
Gumbel-top-k so selection probability is proportional to the importance
weight. The reference collector has no analog — this belongs to the
LLM-training-data surface this engine adds (SURVEY.md training-data
ops), next to decontamination and the dedup family.

Scale shape (100 TB):

  * features are unigrams + bigrams hashed into a FIXED small bucket
    vocabulary (``16**bucket_prefix`` buckets via an md5-prefix hash —
    md5 so the DuckDB oracle replays the exact bucketing). Bucket-count
    aggregation is map-side combined down to at most B rows per side.
  * the log-ratio table λ[b] has ≤ B rows — broadcast; the corpus
    explode → broadcast-join → per-doc sum is ONE shuffle (by doc id,
    partially aggregated map-side). No corpus self-join, no global sort.
  * the target side is a benchmark-sized set; its scan is negligible.

Determinism: bucketing and weights are pure functions of content;
``importance_resample`` derives its Gumbel noise from a SEEDED xxhash64
of the id column, never ``rand()`` — identical under task retries and
at any parallelism (the property that actually bites at scale; same
convention as functions/sampling.py).

Tokenization reuses the dedup family's ``TOKEN_RE`` and the truncated-
shingle convention of :func:`..functions.dedup.shingles`, so one n-gram
definition serves dedup, decontamination and weighting (and one oracle
CTE mirrors it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import TOKEN_RE

__all__ = ["hashed_term_buckets", "dsir_logweights", "importance_resample"]


def hashed_term_buckets(
    df: DataFrame,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    bucket_prefix: int = 2,
) -> DataFrame:
    """One row per (id, bucket) term OCCURRENCE (bag semantics, not set).

    Terms are unigrams + word bigrams (the published DSIR feature set);
    a one-token document contributes its token as both — the same
    truncation convention as ``shingles``. Bucket = first
    ``bucket_prefix`` hex chars of md5(term): 16**prefix buckets,
    portable to the SQL oracle. The tokenizer runs ONCE per row.
    """
    toks = df.select(
        id_col,
        F.expr(f"regexp_extract_all(lower({col}), '{TOKEN_RE}', 0)").alias("_t"),
    )
    terms = (
        "concat(_t, transform(sequence(1, greatest(size(_t) - 1, 1)), "
        "i -> concat_ws(' ', slice(_t, i, 2))))"
    )
    return (
        toks.select(id_col, F.explode(F.expr(terms)).alias("term"))
        .filter(F.col("term") != "")
        .select(
            id_col,
            F.substring(F.md5(F.col("term")), 1, bucket_prefix).alias("bucket"),
        )
    )


def dsir_logweights(
    corpus: DataFrame,
    target: DataFrame,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    bucket_prefix: int = 2,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weights of ``corpus`` vs
    ``target``.

    λ[b] = ln(p_target[b]) − ln(p_raw[b]) with add-``alpha`` smoothing
    over the fixed bucket vocabulary B = 16**bucket_prefix; a document's
    ``logw`` is the sum of λ over its term occurrences (the bag-of-
    n-grams log likelihood ratio of the paper). Returns one row per
    corpus document that has at least one term:

      * ``n_terms``  — term occurrences (unigrams + bigrams);
      * ``logw``     — Σ λ[bucket(term)]  (higher = more target-like);
      * ``avg_logw`` — logw / n_terms (length-normalized variant).

    Only buckets that occur in the corpus need a λ row (a bucket no
    corpus term hashes to can never contribute), so the λ frame is
    bounded by B rows and broadcast-joined.

    The corpus is scanned TWICE (bucket-count pass, then the weighting
    pass) — a true barrier: λ needs the global counts before any doc
    can be scored. Both scans are narrow (id + text only, column
    pruning reaches the parquet scan) and both shuffles are map-side
    combined (≤B rows/partition for counts; one row per doc for
    weights). An epoch-loop caller that re-weights repeatedly should
    pass a cached/checkpointed corpus to amortize the tokenize.
    """
    n_buckets = 16 ** bucket_prefix
    corpus_tf = hashed_term_buckets(
        corpus, col=col, id_col=id_col, bucket_prefix=bucket_prefix
    )
    target_tf = hashed_term_buckets(
        target, col=col, id_col=id_col, bucket_prefix=bucket_prefix
    )
    raw_counts = corpus_tf.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt_counts = target_tf.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_tgt"))
    # BOTH grand totals are WINDOW sums over the joined ≤2B-row count
    # frame — a separate .agg() total (or a second reference to either
    # count frame) would re-execute its whole tokenize+count subtree
    # per action (scan included; Catalyst gives no ReusedExchange
    # guarantee, and when the target is a filter over the same
    # un-materialized pipeline as the corpus, "target-sized" output
    # still costs a full upstream pass to produce). The join is FULL
    # OUTER so target-only buckets participate in t_tgt — a left join's
    # sum would collapse to 0 when the target shares no bucket with the
    # corpus, inflating every λ — and corpus-less rows are dropped only
    # AFTER the totals are taken (the filter cannot push below the
    # empty-partition window). WindowExec's single-partition warning is
    # expected and harmless: the frame is bounded at 2B rows.
    wall = Window.partitionBy()
    lam = (
        raw_counts.join(tgt_counts, "bucket", "full")
        .withColumn(
            "t_raw", F.sum(F.coalesce(F.col("c_raw"), F.lit(0))).over(wall)
        )
        .withColumn(
            "t_tgt", F.sum(F.coalesce(F.col("c_tgt"), F.lit(0))).over(wall)
        )
        .filter(F.col("c_raw").isNotNull())
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("t_tgt") + F.lit(float(alpha * n_buckets)))
                )
                - F.log(
                    (F.col("c_raw") + F.lit(float(alpha)))
                    / (F.col("t_raw") + F.lit(float(alpha * n_buckets)))
                )
            ).alias("lam"),
        )
    )
    return (
        corpus_tf.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("lam").alias("logw"),
        )
        .select(
            id_col,
            "n_terms",
            "logw",
            (F.col("logw") / F.col("n_terms")).alias("avg_logw"),
        )
    )


def importance_resample(
    weights: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "logw",
    seed: int = 0,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k selection of ``k`` rows with probability ∝
    exp(weight/temperature) — importance resampling without replacement,
    in one TakeOrderedAndProject (no global sort materialization).

    The Gumbel noise is derived from a seeded xxhash64 of the id, not
    ``rand()``: retry-stable, parallelism-independent, and replayable
    (same seed → same selection). ``temperature`` > 1 flattens toward
    uniform; → 0 approaches deterministic top-k by weight.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    # uniform in (0,1) from the hash's low 31 bits, offset half a step
    # so u is never exactly 0 or 1
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(2 ** 31)).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2 ** 31))
    gumbel = -F.log(-F.log(u))
    key = F.col(weight_col).cast("double") / F.lit(float(temperature)) + gumbel
    # id_col as secondary sort: the Gumbel key uses the hash's low 31
    # bits, so at corpus scale equal-logw docs CAN collide on _gk; a
    # tie straddling the k-th cutoff would then be broken by partition
    # layout — retry-unstable. The id tiebreak keeps the selection
    # deterministic at any parallelism (same convention as exact_sample).
    return (
        weights.withColumn("_gk", key)
        .orderBy(F.col("_gk").desc(), F.col(id_col))
        .limit(int(k))
        .drop("_gk")
    )
