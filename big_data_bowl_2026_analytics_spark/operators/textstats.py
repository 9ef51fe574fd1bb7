"""Text-analysis operators: language ID, quality scoring, token
statistics, document fingerprinting.

All pure Column expressions over whitespace-tokenized text — JVM-side,
codegen'd, no Python in the hot path. At 100 TB these run as a single
scan + one groupBy each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles_of, tokens

#: Per-language marker-token sets for the n-gram-heuristic language
#: identifier. (Synthetic corpus vocabulary; for a real corpus these
#: are the top stopwords per language.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("data", "slow", "merge"),
    "en": ("the", "a", "fast"),
    "es": ("key", "order", "sort"),
    "fr": ("table", "join", "row"),
    "zh": ("spark", "window", "batch"),
}

#: Generic stopword list for quality scoring.
STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of", "to")


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: count marker-token occurrences per
    language, pick the argmax (ties broken by language code).

    Long-form scoring (stack -> window argmax) keeps the plan one
    projection + one window, and generalizes to any number of
    languages without a combinatorial CASE.
    """
    score_cols = []
    stack_parts = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        in_list = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            F.size(F.expr(f"filter(split({text_col}, ' '), t -> t IN ({in_list}))")).alias(
                f"score_{lang}"
            )
        )
        stack_parts.append(f"'{lang}', score_{lang}")
    scored = df.select(F.col(id_col), *score_cols)
    long = scored.select(
        F.col(id_col),
        F.expr(f"stack({len(LANG_MARKERS)}, {', '.join(stack_parts)}) as (lang, score)"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("lang"))
    return (
        long.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col(id_col), F.col("lang").alias("pred_lang"), F.col("score").alias("best_score"))
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: char/token counts, mean token
    length, stopword ratio, and a blended score — all closed-form
    integer arithmetic (single-spaced text), so cross-engine exact
    before the final rounding.
    """
    toks = tokens(F.col(text_col), distinct=False)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.size(F.expr(f"filter(split({text_col}, ' '), t -> t IN ({stop_list}))"))
    avg_tok_len = (n_chars - (n_tokens - 1)) / n_tokens
    stop_ratio = n_stop / n_tokens
    distinct_ratio = n_distinct / n_tokens
    quality = 0.5 * distinct_ratio + 0.3 * (1.0 - stop_ratio) + 0.2 * F.least(
        avg_tok_len / 10.0, F.lit(1.0)
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.round(avg_tok_len + 1e-9, 6).alias("avg_token_len"),
        F.round(stop_ratio + 1e-9, 6).alias("stopword_ratio"),
        F.round(quality + 1e-9, 6).alias("quality_score"),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus token statistics: occurrences and document frequency per
    token. The shuffle key is the token — at 100 TB the classic skew
    case (stopwords), handled by AQE skew handling plus partial aggs.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col), distinct=False)).alias("tok")
    )
    return tok.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )


def shingle_fingerprints(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document fingerprint: the minimum hash over word n-gram shingles
    (rolling-hash winnowing reduced to k=1), plus the shingle count.
    Two documents sharing a fingerprint almost surely share content.
    """
    bound = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
    exploded = bound.select(
        F.col(id_col), F.explode(shingles_of(F.col("_toks"), n)).alias("sh")
    )
    return exploded.groupBy(id_col).agg(
        F.min(F.md5(F.col("sh"))).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_shingles"),
    )
