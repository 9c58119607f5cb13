"""Text-analysis operators for training-data pipelines.

Language-ID, quality scoring, token counting, and document fingerprinting —
each a narrow, shuffle-free column expression over the `documents` table
(scales linearly with corpus bytes; Catalyst prunes unused columns down to
the parquet scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from singer_spark.functions import md5_int, qround

# Tiny built-in stopword profiles per language — the classic n-gram/stopword
# heuristic (the container has no langdetect/fasttext; profiles are data).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "est"),
    "de": ("der", "die", "das", "und", "zu", "in", "ein", "ist"),
    "zh": ("的", "了", "在", "是", "我", "有", "和", "不"),
}

ENGLISH_STOPWORDS = LANG_PROFILES["en"] + ("was", "for", "on", "with", "as", "at", "by")


def _tokens(text_col: Column) -> Column:
    return F.split(text_col, " ")


def lang_score(text_col: Column, lang: str) -> Column:
    """Fraction of tokens that are stopwords of `lang`."""
    toks = _tokens(text_col)
    marker = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(marker, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predicted language = argmax of per-language stopword ratio, ties by
    language code; 'und' when nothing matches."""
    c = F.col(text_col)
    scored = docs.select(
        F.col(id_col),
        *[qround(lang_score(c, lang), 6).alias(f"score_{lang}") for lang in sorted(LANG_PROFILES)],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_PROFILES)])
    pred = F.lit("und")
    for lang in sorted(LANG_PROFILES, reverse=True):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return scored.withColumn("predicted_lang",
                             F.when(best > 0, pred).otherwise(F.lit("und"))) \
                 .select(id_col, "predicted_lang", *[f"score_{lang}" for lang in sorted(LANG_PROFILES)])


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features + a single score in [0,1]:

    - n_tokens / mean token length  (degenerate-length screens)
    - distinct-token ratio          (repetition screen)
    - stopword ratio                (natural-language screen)
    - punct / digit character ratio (boilerplate screen)

    score = clamped linear blend — deliberately simple, monotone, and
    explainable (quality filters must be auditable)."""
    c = F.col(text_col)
    toks = _tokens(c)
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    mean_tok_len = (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1))
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1))
    stop = F.array(*[F.lit(w) for w in ENGLISH_STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))) / F.greatest(n_tokens, F.lit(1))
    punct_ratio = (F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))) / F.greatest(n_chars, F.lit(1))
    digit_ratio = (F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))) / F.greatest(n_chars, F.lit(1))
    score = (
        F.least(n_tokens / F.lit(200.0), F.lit(1.0)) * 0.25
        + distinct_ratio * 0.25
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.25
        + (1 - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.15
        + (1 - F.least(digit_ratio * F.lit(10.0), F.lit(1.0))) * 0.10
    )
    return docs.select(
        F.col(id_col),
        n_tokens.cast("int").alias("n_tokens"),
        qround(mean_tok_len, 4).alias("mean_token_len"),
        qround(distinct_ratio, 4).alias("distinct_ratio"),
        qround(stop_ratio, 4).alias("stopword_ratio"),
        qround(punct_ratio, 4).alias("punct_ratio"),
        qround(digit_ratio, 4).alias("digit_ratio"),
        qround(score, 4).alias("quality_score"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate: word-boundary
    pieces (letters runs, digit runs, punctuation) + an extra piece per 6
    chars of long words — the standard cheap `len/4`-style estimator, but
    structured."""
    c = F.col(text_col)
    ws = F.size(F.split(c, r"\s+"))
    pieces = F.size(F.expr(f"regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"))
    toks = _tokens(c)
    long_extra = F.aggregate(
        toks, F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.floor(F.length(t) / 6),
    )
    return docs.select(
        F.col(id_col),
        ws.cast("int").alias("ws_tokens"),
        pieces.cast("int").alias("subword_pieces"),
        (pieces + long_extra).cast("int").alias("bpe_estimate"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint for fast identity checks:

    - `fp_md5`    md5 of whitespace-normalized lowercase text
    - `fp_rolling` 40-bit polynomial rolling hash of the normalized token
      stream (order-sensitive, Karp-Rabin style: h = (h*31 + md5_int(token))
      mod 2^40) — built with `aggregate`, no shuffle.  40 bits keeps
      `h*31 + token_hash` inside BIGINT without wraparound."""
    from singer_spark.functions import fan_out

    docs = fan_out(docs)
    c = F.col(text_col)
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    toks = F.split(normalized, " ")
    mod = F.lit(2 ** 40).cast("bigint")
    rolling = F.aggregate(
        toks, F.lit(0).cast("bigint"),
        lambda acc, t: F.pmod(acc * 31 + F.pmod(md5_int(t), mod), mod),
    )
    return docs.select(
        F.col(id_col),
        F.md5(normalized).alias("fp_md5"),
        rolling.alias("fp_rolling"),
    )
