"""End-to-end training-corpus preparation: the composition a data
pipeline actually runs, as one declarative plan.

    raw documents
      → quality gate        (functions.text.quality_score >= min_quality)
      → language gate       (functions.text.lang_id == keep_lang)
      → exact dedup         (keep min doc_id per normalized-text hash)
      → near-dup removal    (minhash+LSH candidate pairs; drop the
                             higher doc_id of each pair — the standard
                             keep-first policy, applied transitively by
                             repeated pair-drop since pairs are closed
                             under the LSH relation on the kept side)
      → clean corpus

Everything is column expressions + two hash aggregations + one
anti-join; at 100 TB the quality/language gates prune before any
shuffle (predicate evaluation is narrow), the dedup shuffles carry only
(hash, id) pairs, and the LSH band join is the same bounded candidate
join as functions.dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup as dd
from . import text as tx

__all__ = ["clean_corpus"]


def clean_corpus(
    docs: DataFrame,
    *,
    min_quality: float = 0.5,
    keep_lang: str = "en",
    shingle_w: int = 3,
    minhash_k: int = 12,
    lsh_bands: int = 4,
    max_dup_line_frac: float | None = None,
    max_top2gram_frac: float | None = None,
    gopher: dict | None = None,
) -> DataFrame:
    """Return the cleaned corpus (doc_id, lang, n_chars, quality).

    ``gopher`` switches on the remaining Rae et al. §A1.1 document
    gates (:func:`..text.gopher_gates` — word-count bounds,
    symbol-to-word ratio, bullet/ellipsis line fractions, alpha-word
    fraction): pass ``{}`` for the published defaults or override
    thresholds by keyword (e.g. ``{"min_words": 30}``). The gate is a
    NARROW filter evaluated in the same scan as the quality/language
    gates — docs drop before anything pays a shuffle.

    The two optional caps add the Gopher repetition gates
    (:func:`..text.repetition_signals`) between the quality/language
    gates and dedup — repetitive docs are cheaper to drop before they
    feed shingling. Defaults off (repetition needs its own keyed
    aggregation pass; the plain gates stay narrow)."""
    scored = tx.quality_score(tx.lang_id(docs))
    gated = scored.filter(
        (F.col("quality") >= min_quality) & (F.col("pred_lang") == keep_lang)
    )
    if gopher is not None:
        gated = tx.gopher_gates(gated, **gopher).filter(F.col("gopher_ok"))
    if max_dup_line_frac is not None or max_top2gram_frac is not None:
        reps = tx.repetition_signals(gated, top_ns=(2,), dup_ns=())
        cond = F.lit(True)
        if max_dup_line_frac is not None:
            cond = cond & (F.col("dup_line_frac") <= max_dup_line_frac)
        if max_top2gram_frac is not None:
            cond = cond & (F.col("top2gram_char_frac") <= max_top2gram_frac)
        gated = gated.join(
            reps.filter(cond).select("doc_id"), "doc_id", "left_semi"
        )

    # exact dedup: keep the minimum doc_id per normalized content hash
    h = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    hashed = gated.withColumn("_h", h)
    keep_exact = hashed.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
    exact = hashed.join(keep_exact, ["_h", "doc_id"]).drop("_h")

    # near-dup removal: drop the higher id of every LSH candidate pair
    sh = dd.shingles(exact, w=shingle_w, distinct=False)
    sigs = dd.minhash_signatures(sh, k=minhash_k)
    pairs = dd.lsh_pairs(sigs, k=minhash_k, bands=lsh_bands)
    drop_ids = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    clean = exact.join(drop_ids, "doc_id", "left_anti")

    return clean.select("doc_id", "lang", "n_chars", F.col("quality"))
