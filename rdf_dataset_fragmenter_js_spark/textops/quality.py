"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure Column expressions (whole-stage codegen,
no UDFs) so they run at scan speed over 100 TB document tables."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "nicht", "ein"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "dans", "que", "pour"],
}


def token_count_col(text: Column) -> Column:
    """Whitespace token count (empty text → 0)."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def word_token_count_col(text: Column) -> Column:
    """BPE-ish token estimate: count of word/number/punctuation units
    (``\\w+`` runs plus isolated non-space symbols)."""
    stripped = F.regexp_replace(text, r"[\w]+|[^\w\s]", "\x01")
    return F.length(F.regexp_replace(stripped, r"[^\x01]", ""))


def _stopword_hits(text: Column, words: list[str]) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = None
    for w in words:
        # occurrences of ' w ' — overlap-free count via split
        c = F.size(F.split(padded, rf"\s{w}\s")) - 1
        hits = c if hits is None else hits + c
    return hits


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    'und' when nothing matches. Deterministic tie-break by language code."""
    text = F.col(text_col)
    structs = [
        F.struct(_stopword_hits(text, ws).alias("hits"), F.lit(code).alias("code"))
        for code, ws in sorted(STOPWORDS.items())
    ]
    # argmax on (hits, code): ties broken toward the lexicographically larger
    # code — simple to mirror in an independent SQL oracle.
    best = F.greatest(*structs)
    pred = F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))
    return docs.withColumn("lang_pred", pred)


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features, rounded to 6dp
    for engine-portable comparison."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = token_count_col(text)
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    en_hits = _stopword_hits(text, STOPWORDS["en"])
    return docs.select(
        "*",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(en_hits / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            n_chars / F.greatest(n_tokens, F.lit(1)),
            6,
        ).alias("mean_token_len"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalized content fingerprint: lowercase, collapse whitespace,
    md5 — the standard cheap doc identity for dedup joins."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select(
        F.col(id_col).alias("doc_id"), F.md5(norm.cast("binary")).alias("fingerprint")
    )
