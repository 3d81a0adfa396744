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


def _words_col(text: Column) -> Column:
    """Whitespace word array (empty text → empty array)."""
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def _word_ngrams(words: Column, n: int) -> Column:
    """Space-joined word ``n``-grams of ``words`` (fewer than ``n`` words →
    empty array). ``F.sequence`` counts DOWN when start > stop, so the
    short-doc case must be guarded explicitly."""
    if n == 1:
        return words
    nw = F.size(words)
    return F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(1), nw - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style word-repetition quality signals (Rae et al. 2021 §A1.1,
    adapted to word n-grams over whitespace-split text). Per document:

    * ``top2gram_frac`` / ``top3gram_frac`` — ``count * len(gram) /
      len(text)`` for the most frequent word 2-/3-gram (ties broken toward
      the lexicographically largest gram so an independent SQL twin can
      reproduce the choice exactly).
    * ``dup5gram_frac`` — ``sum(count * len(gram))`` over 5-grams occurring
      more than once, divided by ``len(text)`` and capped at 1.0 (overlapping
      occurrences each count — a deliberate, documented simplification of
      Gopher's position-coverage variant).
    * ``uniq_word_frac`` — distinct words / total words.

    Scale shape: one explode over tagged (n, gram) rows → two hash
    aggregations keyed on (doc, n, gram) then (doc, n) — partial (map-side)
    aggregation applies on both, no join back to the corpus except the final
    broadcast-sized per-doc pivot. No Python UDFs anywhere."""
    text = F.col(text_col)
    words = _words_col(text)
    def _tagger(n: int):
        # NB: a default-arg lambda (g, n=n) would NOT work here — F.transform
        # binds a second lambda parameter to the element INDEX.
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.concat(
        *[F.transform(_word_ngrams(words, n), _tagger(n)) for n in (1, 2, 3, 5)]
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text).alias("n_chars_r"),
        F.explode(tagged).alias("tg"),
    ).select("doc_id", "n_chars_r", F.col("tg.n").alias("n"), F.col("tg.gram").alias("gram"))

    counts = base.groupBy("doc_id", "n_chars_r", "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_n = counts.groupBy("doc_id", "n_chars_r", "n").agg(
        F.max(F.struct(F.col("c"), F.col("gram"))).alias("top"),
        F.sum(F.when(F.col("c") > 1, F.col("c") * F.length("gram")).otherwise(0)).alias(
            "dup_chars"
        ),
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"),
    )

    def _top_frac(n: int) -> Column:
        return F.max(
            F.when(
                F.col("n") == n,
                F.col("top.c")
                * F.length("top.gram")
                / F.greatest(F.col("n_chars_r"), F.lit(1)),
            )
        )

    pivot = per_n.groupBy("doc_id").agg(
        F.round(F.coalesce(_top_frac(2), F.lit(0.0)), 6).alias("top2gram_frac"),
        F.round(F.coalesce(_top_frac(3), F.lit(0.0)), 6).alias("top3gram_frac"),
        # NB: least() IGNORES nulls (both Spark and DuckDB), so the cap must
        # wrap the coalesce — least(NULL, 1.0) would turn "no 5-grams" into 1.0
        F.round(
            F.least(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("n") == 5,
                            F.col("dup_chars")
                            / F.greatest(F.col("n_chars_r"), F.lit(1)),
                        )
                    ),
                    F.lit(0.0),
                ),
                F.lit(1.0),
            ),
            6,
        ).alias("dup5gram_frac"),
        F.round(
            F.coalesce(
                F.max(
                    F.when(F.col("n") == 1, F.col("n_distinct") / F.col("total"))
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("uniq_word_frac"),
    )
    # left join from the corpus so zero-word documents still get a row
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(pivot, "doc_id", "left")
        .select(
            "doc_id",
            *[
                F.coalesce(F.col(c), F.lit(0.0)).alias(c)
                for c in (
                    "top2gram_frac",
                    "top3gram_frac",
                    "dup5gram_frac",
                    "uniq_word_frac",
                )
            ],
        )
    )


# quality_filter rule order — the emitted reason is the FIRST failing rule.
QUALITY_RULES = (
    "too_few_words",
    "too_many_words",
    "word_length",
    "low_diversity",
    "repetitive_top_word",
    "no_stopwords",
)


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_uniq_word_frac: float = 0.4,
    max_top_word_frac: float = 0.2,
    min_stopword_hits: int = 1,
) -> DataFrame:
    """Composite Gopher/C4-style keep/drop verdict per document with the
    first failing rule as ``reason`` (``'ok'`` when kept). Thresholds follow
    Gopher's document filters (word-count window, mean-word-length window,
    vocabulary diversity, top-word repetition, stopword presence) scaled to
    this corpus.

    Scale shape: every metric is a native array/lambda Column over the
    whitespace split — ``array_distinct`` / ``filter`` / ``aggregate`` run
    inside whole-stage codegen per row, so the whole verdict is a
    shuffle-free scan (the top-word mode is O(distinct·words) per row, fine
    for document-sized rows). No Python UDFs, no groupBy."""
    text = F.col(text_col)
    words = _words_col(text)
    n_words = F.size(words)
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = sum_len / F.greatest(n_words, F.lit(1))
    uniq_frac = F.size(F.array_distinct(words)) / F.greatest(n_words, F.lit(1))
    top_count = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(words),
                lambda x: F.size(F.filter(words, lambda y: y == x)),
            )
        ),
        F.lit(0),
    )
    top_frac = top_count / F.greatest(n_words, F.lit(1))
    en_hits = _stopword_hits(text, STOPWORDS["en"])

    reason = (
        F.when(n_words < min_words, F.lit("too_few_words"))
        .when(n_words > max_words, F.lit("too_many_words"))
        .when(
            (mean_word_len < min_mean_word_len)
            | (mean_word_len > max_mean_word_len),
            F.lit("word_length"),
        )
        .when(uniq_frac < min_uniq_word_frac, F.lit("low_diversity"))
        .when(top_frac > max_top_word_frac, F.lit("repetitive_top_word"))
        .when(en_hits < min_stopword_hits, F.lit("no_stopwords"))
        .otherwise(F.lit("ok"))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(uniq_frac, 6).alias("uniq_word_frac"),
        F.round(top_frac, 6).alias("top_word_frac"),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


# PII patterns, deliberately restricted to the regex subset with IDENTICAL
# semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
# bounded repetition, \b ASCII word boundaries — no lookaround, no
# backreferences. Applied in this dict order (email first so an address's
# host part is never half-eaten by the IP pass).
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d{1,3}-\d{3}-\d{3}-\d{4}", "<PHONE>"),
}


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction — the standard pre-training scrub: replace emails,
    IPv4 addresses, and international phone numbers with typed placeholder
    tokens and report per-document match counts. Pure ``regexp_replace`` /
    split-count Column chains (shuffle-free scan, whole-stage codegen);
    patterns live in :data:`PII_PATTERNS` and are restricted to the
    Java-regex ∩ RE2 subset so an independent SQL twin matches exactly."""
    text = F.col(text_col)
    counts = []
    redacted = text
    for kind, (pat, token) in PII_PATTERNS.items():
        # non-overlapping match count BEFORE this redaction pass
        counts.append(
            (F.size(F.split(redacted, pat)) - 1).cast("long").alias(f"n_{kind}")
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return docs.select(
        F.col(id_col).alias("doc_id"), redacted.alias("redacted"), *counts
    )


def deterministic_sample(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_prefix_below: str = "4",
    salt: str = "",
) -> DataFrame:
    """Reproducible content-hash sampling: keep a document iff the first hex
    digit of ``md5(salt || normalized_text)`` sorts below ``hex_prefix_below``
    (``'4'`` → a uniform ~4/16 = 25 % sample). Hash-based sampling is the
    standard trick for training-data subsampling that must be stable across
    runs, partitionings, and engines — unlike ``df.sample()``, the decision
    is a pure function of content, so re-runs and twin engines agree exactly.
    Normalization matches :func:`fingerprint` (lowercase, collapsed
    whitespace) so verbatim duplicates sample identically. Shuffle-free
    scan; the salt rotates the sample without touching the data."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    h = F.md5(F.concat(F.lit(salt), norm).cast("binary"))
    return docs.select(
        F.col(id_col).alias("doc_id"), h.alias("sample_hash")
    ).where(F.substring("sample_hash", 1, 1) < hex_prefix_below)
