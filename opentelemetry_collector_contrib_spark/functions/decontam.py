"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

Standard training-data hygiene (the GPT-3 appendix-C / PaLM recipe):
before training, any document that collides with a held-out benchmark
on a long-enough word n-gram is removed (or at least reported), so test
questions don't leak into the training corpus. The reference collector
has no analog — this belongs to the LLM-data-pipeline surface this
engine adds on top of the log operators (SURVEY.md training-data ops).

Scale shape (the only one that works at 100 TB):

  * the EVAL side is a benchmark — thousands of documents, not
    billions. Its distinct n-gram set is broadcast; the corpus side
    never shuffles for the join.
  * the corpus side is ONE narrow pass: tokenize once, explode to
    (doc, shingle), broadcast-left-join against the eval set, and one
    hash aggregation (map-side combined) back to per-doc counts. No
    corpus self-join, no global sort.
  * tokenization/shingling reuses :func:`..functions.dedup.shingles`
    verbatim, so contamination, minhash and Jaccard all agree on what
    an n-gram is (and the DuckDB oracle mirrors one definition).

Determinism: pure set algebra over content — no sampling, no rand();
identical under task retries by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles

__all__ = ["contamination_report", "decontaminate"]


def contamination_report(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document contamination counts against ``eval_docs``.

    Returns one row per input document:

      * ``n_ngrams`` — distinct word ``n``-grams in the document;
      * ``n_contaminated`` — how many of those also occur anywhere in
        the eval set (distinct collision count, the GPT-3 criterion);
      * ``contamination`` — the contaminated fraction in [0, 1];
      * ``contaminated`` — true iff ``n_contaminated >= min_hits``
        (default 1: a single long-n-gram collision flags the doc).

    ``n`` defaults to 8 words; GPT-3 used 13 — at 100 TB pick the
    published value for the benchmark suite being protected. Documents
    shorter than ``n`` words contribute their single truncated shingle
    (same convention as the dedup family, mirrored by the oracle).

    Documents with ZERO shingles (empty/whitespace/punctuation-only
    text produces no ``[a-z0-9]`` token) still get their row —
    ``n_ngrams = 0``, ``contamination = 0.0``, un-contaminated — via a
    left join from the id spine back onto the aggregate (ids only, a
    narrow shuffle); dropping them would silently bias any corpus-rate
    computed as ``avg(contaminated)`` over the report.
    """
    doc_sh = shingles(docs, col=col, id_col=id_col, w=n, distinct=True)
    eval_sh = (
        shingles(eval_docs, col=col, id_col=id_col, w=n, distinct=True)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = doc_sh.join(F.broadcast(eval_sh), "shingle", "left")
    rep = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_contaminated"),
    )
    spine = docs.select(id_col)
    return spine.join(rep, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias("n_ngrams"),
        F.coalesce(F.col("n_contaminated"), F.lit(0))
        .cast("long")
        .alias("n_contaminated"),
        F.when(
            F.col("n_ngrams") > 0,
            F.col("n_contaminated").cast("double") / F.col("n_ngrams"),
        )
        .otherwise(F.lit(0.0))
        .alias("contamination"),
        (F.coalesce(F.col("n_contaminated"), F.lit(0)) >= F.lit(int(min_hits)))
        .alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """The corpus with contaminated documents removed.

    Survivors keep their full original schema: the report is computed
    on (id, text) only and joined back by id — a broadcast-able or
    shuffle-hash join on the id key, never a second text scan.
    """
    flagged = (
        contamination_report(
            docs, eval_docs, col=col, id_col=id_col, n=n, min_hits=min_hits
        )
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    return docs.join(flagged, id_col, "left_anti")
