"""Text-analysis operators for training-data pipelines: language ID
(marker-word heuristic), quality scoring, token counting, document
fingerprinting.  All JVM-side column expressions — no UDFs — so they
whole-stage-codegen and mirror exactly into the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny marker lexicons (n-gram-heuristic stand-in; a real fastText model
# would be a pandas-UDF upgrade — same operator shape)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "es"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def _tokens(text_col: str):
    return F.split(F.col(text_col), " ")


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Predicted language = argmax marker-word hit count, ties → 'und'
    (deterministic, engine-portable)."""
    toks = _tokens(text_col)
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # deterministic priority order on ties: first lang in dict wins
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    out = docs.withColumn("lang_pred", pred)
    for lang, sc in scores.items():
        out = out.withColumn(f"score_{lang}", sc)
    return out


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score: char/token counts,
    mean token length, stopword ratio, distinct-token ratio (boilerplate
    and keyword-stuffing both crater the distinct ratio)."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    stop_cnt = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    mean_tok_len = (n_char - (n_tok - 1)) / n_tok  # chars minus separators
    score = (
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.4
        + distinct_ratio * 0.4
        + F.least(stop_cnt / 5.0, F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        n_char.alias("char_len"),
        n_tok.alias("token_cnt"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        stop_cnt.alias("stop_hits"),
        F.round(score, 6).alias("quality"),
    )


def bow_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Bag-of-words fingerprint: md5 of the sorted distinct token set —
    order-insensitive content identity (word-shuffled duplicates collide;
    complements the exact md5 fingerprint)."""
    toks = _tokens(text_col)
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(toks))).cast("binary")
        ).alias("bow_fp"),
    )
