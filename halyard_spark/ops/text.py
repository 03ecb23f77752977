"""Text analysis over a documents table: tokenization, quality scoring,
language ID, fingerprinting.  Everything is built-in column functions
(whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "an", "of", "to", "and", "in", "is", "it", "for"]

# marker words per language for the n-gram/marker-scoring heuristic
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "fast", "slow"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "dans"],
    "es": ["el", "la", "los", "y", "por"],
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization; empty text -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    t = tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / stopword / distinctness ratios -> a composite [0,1] score.

    Heuristics in the style of C4/Gopher quality filters, all as exact
    rational arithmetic until the final rounding so results are
    engine-portable.
    """
    t = tokens(text_col)
    n = F.size(t)

    def ratio(num):
        # empty/whitespace-only documents have n=0: their ratios (and
        # quality) are defined as 0 rather than killing the whole job
        # with an ANSI DIVIDE_BY_ZERO on one bad row
        return F.when(n > 0, num / n).otherwise(F.lit(0.0))

    stop = F.size(F.filter(t, lambda x: x.isin(STOPWORDS)))
    dist = F.size(F.array_distinct(t))
    avg_len = ratio(F.length(F.concat_ws("", t)))
    return docs.select(
        F.col(id_col),
        F.round(ratio(stop), 6).alias("stop_ratio"),
        F.round(ratio(dist), 6).alias("distinct_ratio"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(
            (F.least(n / F.lit(100.0), F.lit(1.0)) + ratio(stop) + ratio(dist)) / 3.0, 6
        ).alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language scoring; deterministic argmax (ties -> first
    language in LANG_MARKERS order).  Returns per-language scores too."""
    t = tokens(text_col)
    scores = {
        lang: F.size(F.filter(t, lambda x: x.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        better = scores[lang] > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, scores[lang]).otherwise(best_score)
    cols = [F.col(id_col)] + [scores[lang].alias(f"score_{lang}") for lang in langs]
    return docs.select(*cols, best.alias("pred_lang"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (a deterministic, engine-portable stand-in for a
    rolling hash)."""
    t = F.array_join(F.array_sort(F.array_distinct(tokens(text_col))), " ")
    return docs.select(F.col(id_col), F.md5(t.cast("binary")).alias("fingerprint"))
