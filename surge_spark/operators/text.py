"""Text-analysis operators for training-data pipelines: language ID
(stopword n-gram heuristic), quality scoring, token counting, document
fingerprinting. Everything is built-in-function only (whole-stage codegen) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text, tokens

# Tiny per-language stopword lists for the heuristic language scorer.
# Deterministic and mirrored verbatim in the DuckDB oracle SQL.
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

# A BPE-ish token proxy: words plus digit runs plus residual punctuation
# glyphs — deterministic and cheap, matching what a regex pre-tokenizer does
# ahead of BPE merges.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count, distinct tokens, char length, avg token len."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(text_col).alias("n_chars"),
        F.round(
            F.length(F.array_join(toks, "")) / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("avg_token_len"),
    )


def bpe_ish_token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return df.select(
        F.col(id_col),
        F.size(
            F.filter(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0),
                lambda t: t != "",
            )
        ).alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: length, alpha ratio, stopword ratio,
    mean word length, and a composed [0,1] score. Mirrors the usual
    pretraining-data filters (Gopher/C4-style rules) in spirit."""
    toks = tokens(text_col)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    n_chars = F.greatest(F.length(text_col), F.lit(1))
    stop = F.array([F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    stop_ratio = n_stop / n_tok
    alpha_ratio = alpha_chars / n_chars
    mean_wlen = F.length(F.array_join(toks, "")) / n_tok
    score = F.least(
        F.lit(1.0),
        (
            F.when((mean_wlen >= 3) & (mean_wlen <= 10), 0.4).otherwise(0.0)
            + F.when(alpha_ratio >= 0.6, 0.3).otherwise(0.0)
            + F.when(F.size(toks) >= 10, 0.3).otherwise(0.0)
        ),
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(score, 2).alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: count stopword hits per language, argmax with
    a fixed preference order on ties ('en' > 'es' > 'fr' > 'de' > 'zh', then
    'und' when nothing matches). Fully declarative → same logic is expressible
    in the oracle SQL."""
    toks = tokens(text_col)
    out = df.select(F.col(id_col), toks.alias("_toks"))
    order = list(LANG_STOPWORDS)
    for lang in order:
        stop = F.array([F.lit(s) for s in LANG_STOPWORDS[lang]])
        out = out.withColumn(
            f"_hits_{lang}", F.size(F.filter(F.col("_toks"), lambda t: F.array_contains(stop, t)))
        )
    # strict > comparison in declaration order → ties resolve to the first
    # language in LANG_STOPWORDS; zero hits everywhere → 'und'
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in order:
        hits = F.col(f"_hits_{lang}")
        take = hits > best_hits
        new_best = F.when(take, F.lit(lang)).otherwise(best)
        new_hits = F.when(take, hits).otherwise(best_hits)
        best, best_hits = new_best, new_hits
    return out.select(
        F.col(id_col),
        best.alias("pred_lang"),
        best_hits.cast("int").alias("stopword_hits"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprint of the normalized text (md5 — stable across
    engines, so the oracle can reproduce it)."""
    return df.select(
        F.col(id_col), F.md5(normalize_text(text_col)).alias("fingerprint")
    )


def repetition_score(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Gopher-style repetition features: the fraction of word n-grams that
    are repeats of an earlier occurrence, plus the share of tokens covered
    by the single most-frequent n-gram. High values flag boilerplate /
    template / spam documents that near-dup passes miss (the repetition is
    WITHIN the document). All map-side per doc — the n-gram multiset never
    leaves its row, so this is a pure projection at any corpus size."""
    from .dedup import shingle_array, tokens as _tokens

    grams = shingle_array(text_col, n)  # distinct grams
    toks = _tokens(text_col)
    # total gram occurrences = max(n_tokens - n + 1, 0) (+ short-doc case)
    n_toks = F.size(toks)
    total = F.when(n_toks >= n, n_toks - n + 1).otherwise(
        F.when(F.length(F.trim(F.col(text_col) if isinstance(text_col, str) else text_col)) > 0, 1).otherwise(0)
    )
    dup_fraction = F.when(
        total > 0, (total - F.size(grams)) / total
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        total.cast("int").alias("n_ngrams"),
        F.size(grams).alias("n_distinct_ngrams"),
        F.round(dup_fraction, 6).alias("dup_ngram_fraction"),
    )


# deliberately simple, RE2-compatible patterns (no lookarounds) so the exact
# same regex strings run in Spark (Java regex) and DuckDB (RE2) oracles
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"


def redact_pii(
    df: DataFrame, id_col: str, text_col: str, replacement: str = "[REDACTED]"
) -> DataFrame:
    """Training-data PII scrub: replace email addresses and phone-number
    shaped spans. Pure regexp_replace projection — map-side, no shuffle,
    engine-portable patterns (also count the hits for audit sampling)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    step1 = F.regexp_replace(c, PII_EMAIL, replacement)
    return df.select(
        F.col(id_col),
        F.regexp_replace(step1, PII_PHONE, replacement).alias("redacted"),
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PII_PHONE), 0)).alias("n_phones"),
    )
