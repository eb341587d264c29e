"""Text-analysis operators (beyond-reference training-data surface).

Language id (stopword-ratio heuristic), quality scoring, token
counting, and document fingerprinting — all as pure column expressions
so they run JVM-side over 100 TB and are replayable in the DuckDB
oracle. Every constant (stopword lists, weights) is module-level so
Spark and SQL renderings stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mr_mpi_blast_spark.functions.hashing import normalized_text
from mr_mpi_blast_spark.operators.similarity import round4_xengine

# tiny per-language stopword lists for the n-gram/stopword heuristic;
# priority order breaks ties deterministically
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "se", "un"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "une"],
}
LANG_PRIORITY = ["en", "es", "de", "fr"]

PUNCT_CLASS = "[.,!?;:]"
WORD_PATTERN = "[a-z]+|[0-9]+"      # BPE-ish: letter runs and digit runs


def tokens(col: Column) -> Column:
    return F.split(normalized_text(col), " ")


def _in_list(words: list[str]):
    """HOF-lambda-safe membership test (Column.isin is unsupported on
    lambda variables): array_contains over a literal array."""
    arr = F.array(*[F.lit(w) for w in words])
    return lambda t: F.array_contains(arr, t)


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over tokens."""
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, _in_list(words)))
        for lang, words in STOPWORDS.items()
    }


def lang_id(col: Column) -> Column:
    """argmax of lang_scores; ties go to the earlier LANG_PRIORITY
    entry (an ordered CASE chain — en wins ties by being evaluated
    first, matching the SQL oracle rendering exactly); 'und' when no
    stopword hits at all."""
    scores = lang_scores(col)
    all_zero = None
    for lang in LANG_PRIORITY:
        z = scores[lang] == 0
        all_zero = z if all_zero is None else (all_zero & z)
    expr = None
    for i, lang in enumerate(LANG_PRIORITY):
        rest = LANG_PRIORITY[i + 1:]
        if not rest:
            expr = expr.otherwise(F.lit(lang))
            break
        cond = None
        for other in rest:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None \
            else expr.when(cond, F.lit(lang))
    return F.when(all_zero, F.lit("und")).otherwise(expr)


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / mean-token-length features and
    a composite [0,1] quality score (monotone heuristic: longer docs
    with moderate punctuation and some stopwords score higher)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    stop_hits = F.size(F.filter(toks, _in_list(STOPWORDS["en"])))
    mean_tok = n_chars / F.greatest(n_tokens, F.lit(1))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    score = (F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
             + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
             + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.3)
    # round4_xengine (floor form), NOT F.round: Spark's round() on
    # doubles goes through the shortest-decimal string repr before
    # HALF_UP and can disagree with a binary-rounding oracle at
    # boundary doubles — observed at sf0.1 (quality 0.8402 vs 0.8403
    # on one document)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        round4_xengine(mean_tok).alias("mean_token_len"),
        round4_xengine(punct_ratio).alias("punct_ratio"),
        round4_xengine(stop_ratio).alias("stopword_ratio"),
        round4_xengine(score).alias("quality"))


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + regex word count (WORD_PATTERN) +
    distinct-token count."""
    c = F.col(text_col)
    toks = tokens(c)
    words = F.regexp_extract_all(F.lower(c), F.lit(WORD_PATTERN), 0)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("ws_tokens"),
        F.size(words).alias("regex_tokens"),
        F.size(F.array_distinct(toks)).alias("distinct_tokens"))


def fingerprints(df: DataFrame, shingle_n: int = 16, sketch_k: int = 4,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 of normalized text (exact identity)
    plus a k-min sketch (the winnowing/rolling-hash analog: the k
    smallest md5s over distinct char shingles, joined) for
    near-identity.

    Shape: project the normalized text ONCE, explode shingles, hash,
    re-aggregate. Hashing inside a higher-order transform would
    re-evaluate the normalization regex per shingle (~300x/row) —
    HOF lambdas are interpreted per element with no subexpression
    reuse across the lambda boundary."""
    from pyspark.sql import Window

    from mr_mpi_blast_spark.functions.hashing import char_shingles
    from mr_mpi_blast_spark.session import spread_for_compute
    norm_df = spread_for_compute(df, id_col).select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("__norm"))
    sh = norm_df.select(
        F.col(id_col),
        F.md5("__norm").alias("fp_exact"),
        F.explode(char_shingles(F.col("__norm"), shingle_n)).alias("s"))
    # k smallest distinct hashes via dense_rank + WindowGroupLimit:
    # the rank filter is applied MAP-SIDE (all of a doc's shingles
    # live in its input partition), so the shuffle carries <= k rows
    # per doc instead of every (doc, shingle-hash) pair — the former
    # single fat collect_set aggregation shuffled the whole exploded
    # shingle table and held each doc's full distinct-hash set in agg
    # state (superlinear wall at the sf0.1 -> sf1.0 decade; ~14x for
    # 10x rows). dense_rank (not row_number) keeps ties = duplicate
    # hashes, which the collect_set then dedups — output identical.
    w = Window.partitionBy(id_col, "fp_exact").orderBy("h")
    ranked = (sh.withColumn("h", F.md5("s"))
              .withColumn("rk", F.dense_rank().over(w))
              .filter(F.col("rk") <= sketch_k))
    return (ranked.groupBy(id_col, "fp_exact")
            .agg(F.array_join(
                F.slice(F.array_sort(F.collect_set("h")), 1, sketch_k),
                "|").alias("fp_sketch"))
            .select(id_col, "fp_exact", "fp_sketch"))
