"""Text-analysis stages for a training-data pipeline over `documents`.

All stages are pure Catalyst column expressions (whole-stage codegen,
no Python in the hot path) built on a shared tokenizer. Every function
has a dialect-portable DuckDB mirror in `__spark_entry__.oracle_sql`.

Reference analogy: these play the role OTTL converters play in the
collector (pkg/ottl/ottlfuncs) — pure per-record derivations — applied
to document corpora instead of log records.

Scale: tokenization + stats are narrow (no shuffle); a 100 TB corpus
maps straight through with column pruning (only `text` is read when the
query selects derived stats + doc_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "tokens",
    "token_count",
    "bpe_ish_count",
    "lang_id",
    "quality_score",
    "gopher_gates",
    "doc_fingerprint",
    "repetition_signals",
    "STOPWORDS",
]

#: shared word tokenizer — lowercased alnum runs (identical regex in RE2
#: (DuckDB) and Java (Spark) dialects)
TOKEN_RE = "[a-z0-9]+"
#: BPE-ish subword proxy: letter runs | digit runs | single symbol
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def tokens(col: str = "text") -> Column:
    return F.expr(f"regexp_extract_all(lower({col}), '{TOKEN_RE}', 0)")


def token_count(df: DataFrame, col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace-ish token count (words)."""
    return df.withColumn(out, F.size(tokens(col)))


def bpe_ish_count(df: DataFrame, col: str = "text", out: str = "n_bpe") -> DataFrame:
    """Subword-proxy token count: letter runs + digit runs + symbols."""
    return df.withColumn(out, F.size(F.expr(
        f"regexp_extract_all({col}, '{BPE_RE}', 0)"
    )))


# Language-ID: tiny per-language stopword lists; prediction = argmax of
# stopword hits with a deterministic tie order (en first). An n-gram
# heuristic in the fasttext spirit, sized for an oracle-checkable demo.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "por", "con", "para"],
    "it": ["il", "la", "di", "e", "che", "non", "una", "per", "con", "sono"],
}


def _hits_arr(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def _hits(col: str, words: list[str]) -> Column:
    arr = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter(regexp_extract_all(lower({col}), '{TOKEN_RE}', 0), "
        f"t -> array_contains(array({arr}), t)))"
    )


def lang_id(df: DataFrame, col: str = "text", out: str = "pred_lang") -> DataFrame:
    """Stopword-hit language ID; ties resolve in declaration order.

    Declared langs with zero hits fall through to 'und' (undetermined).
    """
    langs = list(STOPWORDS)
    # tokenize once, then count hits per language into named columns so
    # the argmax chain references cheap ints, not repeated regex runs
    df = df.withColumn("_lid_toks", tokens(col))
    for lang in langs:
        df = df.withColumn(
            f"_hit_{lang}", _hits_arr(F.col("_lid_toks"), STOPWORDS[lang])
        )
    hit_cols = {lang: F.col(f"_hit_{lang}") for lang in langs}
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    # reversed: earlier language wins ties because later whens wrap outside
    for lang in reversed(langs):
        pred = F.when(hit_cols[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return df.withColumn(out, pred).drop(
        "_lid_toks", *[f"_hit_{lang}" for lang in langs]
    )


def quality_score(df: DataFrame, col: str = "text", out: str = "quality") -> DataFrame:
    """Composite document-quality score in [0, 1].

    Components (all portable arithmetic):
      * length_ok     — 1 if 20 <= chars <= 20000, scaled below/above
      * alpha_ratio   — alnum chars / chars
      * stopword_sig  — min(1, en-stopword hits / 5): natural prose signal
      * word_len_ok   — mean word length in [3, 12]

    score = 0.25*each. Also emits the components for inspection.
    """
    # tokenize ONCE into a named column: CollapseProject keeps non-cheap
    # expressions like regexp_extract_all from being inlined into every
    # use site, so the regex runs once per row, not once per reference
    df = df.withColumn("_q_toks", tokens(col))
    t = F.col("_q_toks")
    chars = F.length(F.col(col)).cast("double")
    n_tok = F.size(t).cast("double")
    alpha = F.length(F.regexp_replace(F.col(col), "[^A-Za-z0-9]", "")).cast("double")
    alpha_ratio = F.when(chars > 0, alpha / chars).otherwise(F.lit(0.0))
    length_ok = F.when(chars < 20, chars / 20).when(
        chars > 20000, F.lit(20000.0) / chars
    ).otherwise(F.lit(1.0))
    stop_sig = F.least(
        F.lit(1.0), _hits_arr(t, STOPWORDS["en"]).cast("double") / 5
    )
    mean_wl = F.when(n_tok > 0, alpha / n_tok).otherwise(F.lit(0.0))
    word_len_ok = F.when((mean_wl >= 3) & (mean_wl <= 12), 1.0).otherwise(0.0)
    return (
        df.withColumn("length_ok", length_ok)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("stop_sig", stop_sig)
        .withColumn("word_len_ok", word_len_ok)
        .withColumn(
            out,
            0.25 * F.col("length_ok")
            + 0.25 * F.col("alpha_ratio")
            + 0.25 * F.col("stop_sig")
            + 0.25 * F.col("word_len_ok"),
        )
        .drop("_q_toks")
    )


#: symbols Gopher's symbol-to-word ratio counts: '#' plus ellipses
SYMBOL_RE = r"#|\.\.\.|…"
#: line-leading bullet glyphs
BULLET_RE = "^[-*•‣▪]"
#: line-trailing ellipsis
ELLIPSIS_RE = r"(\.\.\.|…)$"


def gopher_gates(
    df: DataFrame,
    col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    out: str = "gopher_ok",
) -> DataFrame:
    """The remaining Gopher document gates (Rae et al. 2021 §A1.1),
    complementing :func:`quality_score` (length/alpha/stopword/word-len)
    and :func:`repetition_signals` (dup-line + n-gram fractions):

      * ``n_words`` within ``[min_words, max_words]``;
      * ``symbol_word_ratio`` — '#'/ellipsis occurrences per word
        ≤ ``max_symbol_word_ratio``;
      * ``bullet_line_frac`` — non-blank lines starting with a bullet
        glyph ≤ ``max_bullet_line_frac``;
      * ``ellipsis_line_frac`` — non-blank lines ending in an ellipsis
        ≤ ``max_ellipsis_line_frac``;
      * ``alpha_word_frac`` — words containing ≥1 letter
        ≥ ``min_alpha_word_frac``.

    Emits each signal column plus the combined boolean ``out``. All
    narrow Catalyst expressions over one tokenization and one line
    split — no shuffle, no Python; at corpus scale this gate runs
    inside the scan before anything pays an exchange. Thresholds
    default to the published Gopher values."""
    df = df.withColumn("_gg_toks", tokens(col)).withColumn(
        "_gg_lines",
        F.filter(
            F.split(F.col(col), "\n"), lambda l: F.trim(l) != ""
        ),
    )
    t, ln = F.col("_gg_toks"), F.col("_gg_lines")
    n_words = F.size(t)
    n_lines = F.size(ln)
    d_words = F.greatest(n_words, F.lit(1)).cast("double")
    d_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    # F.lit pattern (not an F.expr SQL literal): SQL string literals
    # re-process backslashes, which would corrupt the \.\.\. escape
    n_sym = F.size(F.regexp_extract_all(F.col(col), F.lit(SYMBOL_RE), F.lit(0)))
    n_bullet = F.size(F.filter(ln, lambda l: F.trim(l).rlike(BULLET_RE)))
    n_ell = F.size(F.filter(ln, lambda l: F.rtrim(l).rlike(ELLIPSIS_RE)))
    n_alpha_w = F.size(F.filter(t, lambda w: w.rlike("[a-z]")))
    out_df = (
        df.withColumn("n_words", n_words)
        .withColumn("symbol_word_ratio", n_sym.cast("double") / d_words)
        .withColumn("bullet_line_frac", n_bullet.cast("double") / d_lines)
        .withColumn("ellipsis_line_frac", n_ell.cast("double") / d_lines)
        .withColumn("alpha_word_frac", n_alpha_w.cast("double") / d_words)
    )
    ok = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
    )
    return out_df.withColumn(out, ok).drop("_gg_toks", "_gg_lines")


def doc_fingerprint(
    df: DataFrame, col: str = "text", *, w: int = 5, out: str = "fingerprint"
) -> DataFrame:
    """Winnowing-style document fingerprint: the lexicographic MIN of the
    md5 hashes of all word ``w``-gram shingles (one representative hash
    per doc — robust to local edits, unlike a whole-text hash which is
    also emitted as ``exact_hash``).

    Narrow stage: the shingle array never leaves the row (array_min over
    a transform), so there is NO explode and NO shuffle.

    The token array materializes as a named column FIRST — embedding the
    regexp_extract_all inside the transform lambda would re-run the
    regex once per shingle (higher-order-function lambdas defeat
    subexpression elimination), turning a linear stage quadratic.
    """
    df = df.withColumn("_fp_toks", tokens(col))
    t = F.col("_fp_toks")
    seq = F.sequence(F.lit(1), F.greatest(F.size(t) - (w - 1), F.lit(1)))
    sh = F.transform(seq, lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, w))))
    return (
        df.withColumn(out, F.array_min(sh))
        .withColumn(
            "exact_hash", F.md5(F.lower(F.regexp_replace(F.col(col), r"\s+", " ")))
        )
        .drop("_fp_toks")
    )


def repetition_signals(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
) -> DataFrame:
    """Gopher-style within-document repetition metrics (Rae et al. 2021,
    §A1.1 — the standard quality gate a training-data pipeline runs
    before dedup):

      * ``dup_line_frac`` / ``dup_line_char_frac`` — fraction of lines
        (and of line characters) occurring more than once in the doc;
      * ``top{n}gram_char_frac`` for n in ``top_ns`` — characters
        covered by the single most frequent word n-gram / total token
        characters;
      * ``dup{n}gram_char_frac`` for n in ``dup_ns`` — characters in
        all occurrences of n-grams that appear more than once / total
        token characters.

    Scale shape: ONE corpus scan and ONE explode — every requested
    n-gram family plus the line terms concatenate into a single
    (n, term) struct array per doc before exploding (a per-n union
    would rescan the corpus once per family). Then two keyed
    aggregations: (doc, n, term) count with map-side combine, and a
    per-doc rollup pivoted by conditional sums. The grouping key is
    (doc, term), so hot docs spread across partitions; nothing is
    collected per-doc, no windows over full docs, no Python. Output:
    one row per input doc with the metric columns (docs with no tokens
    get zeros).
    """
    t = F.col("_rs_toks")
    # token-character total per doc (n-gram fractions use Gopher's
    # character-weighted denominators)
    base = df.select(
        F.col(id_col),
        tokens(col).alias("_rs_toks"),
        F.split(F.col(col), "\n").alias("_rs_lines"),
    )

    def _tagged(n: int, term: Column) -> Column:
        return F.struct(F.lit(n).alias("n"), term.alias("term"))

    def _gram_lambda(n: int):
        # one-parameter lambda: a `lambda i, n=n` would LOOK unary but
        # F.transform sees two params and passes the element index as n
        return lambda i: _tagged(n, F.concat_ws(" ", F.slice(t, i, n)))

    families = []
    for n in sorted(set(top_ns) | set(dup_ns)):
        seq = F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(0)))
        families.append(
            F.when(
                F.size(t) >= n,
                F.transform(seq, _gram_lambda(n)),
            ).otherwise(F.array().cast("array<struct<n:int,term:string>>"))
        )
    families.append(
        F.transform(
            F.filter(F.col("_rs_lines"), lambda l: F.trim(l) != ""),
            lambda l: _tagged(0, l),  # n=0 marks line terms
        )
    )
    # the count aggregation only needs each term's IDENTITY and LENGTH,
    # so shuffle an 8-byte xxhash64 + int instead of the term string —
    # a 10-gram key averages ~60 bytes, and the (doc, n, term) exchange
    # dominates this op's cost at corpus scale (measured ~14s → ~5s
    # warm at sf0.1; collision odds across ~1e6 in-doc terms are ~1e-7
    # and a collision only perturbs one doc's fraction marginally)
    terms = base.select(
        F.col(id_col), F.explode(F.concat(*families)).alias("_t")
    ).select(
        F.col(id_col),
        F.col("_t.n").alias("n"),
        F.xxhash64(F.col("_t.term")).alias("term_h"),
        F.length(F.col("_t.term")).alias("len"),
    )

    counted = terms.groupBy(id_col, "n", "term_h").agg(
        F.count(F.lit(1)).alias("c"), F.max("len").alias("len")
    )
    # per (doc, n) rollup: total chars, top-term coverage, dup coverage
    per_n = counted.groupBy(id_col, "n").agg(
        F.sum(F.col("c") * F.col("len")).alias("tot_chars"),
        F.max(F.struct(F.col("c"), F.col("len"))).alias("top"),
        F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("len")).otherwise(0)).alias(
            "dup_chars"
        ),
        F.sum(F.col("c")).alias("n_terms"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_terms"),
    )
    safe = F.greatest(F.col("tot_chars"), F.lit(1)).cast("double")
    metrics = per_n.select(
        F.col(id_col),
        F.col("n"),
        (F.col("top.c") * F.col("top.len") / safe).alias("top_frac"),
        (F.col("dup_chars") / safe).alias("dup_frac"),
        (F.col("dup_terms") / F.greatest(F.col("n_terms"), F.lit(1)).cast("double")).alias(
            "dup_term_frac"
        ),
    )
    agg_cols = []
    for n in sorted(set(top_ns)):
        agg_cols.append(
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("top_frac"))), F.lit(0.0)
            ).alias(f"top{n}gram_char_frac")
        )
    for n in sorted(set(dup_ns)):
        agg_cols.append(
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("dup_frac"))), F.lit(0.0)
            ).alias(f"dup{n}gram_char_frac")
        )
    agg_cols.append(
        F.coalesce(
            F.max(F.when(F.col("n") == 0, F.col("dup_term_frac"))), F.lit(0.0)
        ).alias("dup_line_frac")
    )
    agg_cols.append(
        F.coalesce(
            F.max(F.when(F.col("n") == 0, F.col("dup_frac"))), F.lit(0.0)
        ).alias("dup_line_char_frac")
    )
    out = metrics.groupBy(id_col).agg(*agg_cols)
    # left join back so token-less docs keep a row (all-zero metrics)
    ids = df.select(id_col).distinct()
    zero = [
        F.coalesce(F.col(c), F.lit(0.0)).alias(c)
        for c in out.columns
        if c != id_col
    ]
    return ids.join(out, on=id_col, how="left").select(F.col(id_col), *zero)
