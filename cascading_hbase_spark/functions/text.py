"""Text-analysis column expressions: tokenization, language-ID
heuristic, quality scoring, token counting, document fingerprinting
(SURVEY.md §2.11).  All pure Catalyst expressions (split / higher-order
functions / regexp) — no Python UDFs, so they run inside whole-stage
codegen and scale embarrassingly-parallel over partitions."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = [
    "tokens",
    "shingles",
    "token_count_regex",
    "stopword_ratio",
    "lang_id_en",
    "quality_score",
    "fingerprint",
    "strip_html",
    "normalize_ws",
    "redact_pii",
    "EN_STOPWORDS",
    "TOKEN_REGEX",
]

# RE2-compatible (no backrefs/lookaround) so the DuckDB oracle runs the
# same patterns verbatim.
HTML_TAG_RE = r"<[^>]+>"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"

EN_STOPWORDS = ("the", "a", "of", "and", "or", "to", "in", "is")

# BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation.
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(tok: Column, n: int = 3) -> Column:
    """n-word shingles (1-based element_at; empty array when the doc is
    shorter than n tokens)."""
    idx = F.sequence(F.lit(1), F.size(tok) - F.lit(n - 1))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(tok, i + F.lit(k)) for k in range(n)]),
    )
    return F.when(F.size(tok) >= n, sh).otherwise(F.array().cast("array<string>"))


def token_count_regex(text: Column | str, pattern: str = TOKEN_REGEX) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("bigint")


def stopword_ratio(tok: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (exact integer ratio in
    double — deterministic across engines)."""
    n_stop = F.size(F.filter(tok, lambda t: t.isin(*stopwords)))
    return n_stop.cast("double") / F.size(tok).cast("double")


def lang_id_en(tok: Column, threshold: float = 0.05) -> Column:
    """N-gram/stopword language heuristic: 'en' iff the English stopword
    ratio clears the threshold."""
    return F.when(stopword_ratio(tok) > threshold, F.lit("en")).otherwise(F.lit("other"))


def quality_score(text: Column | str) -> Column:
    """Composite document quality score in [0, 1]: length saturation,
    non-punctuation share, stopword share."""
    c = F.col(text) if isinstance(text, str) else text
    tok = tokens(c)
    n_tok = F.size(tok).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^a-zA-Z0-9\s]"), F.lit(0))).cast("double")
    punct_ratio = n_punct / F.greatest(F.length(c).cast("double"), F.lit(1.0))
    return F.round(
        F.lit(0.4) * len_score + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(stopword_ratio(tok) * 4.0, F.lit(1.0)),
        6,
    )


def strip_html(text: Column | str) -> Column:
    """Remove HTML/XML tags."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, HTML_TAG_RE, " ")


def normalize_ws(text: Column | str) -> Column:
    """Collapse whitespace runs and trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def redact_pii(text: Column | str) -> Column:
    """Replace emails and URLs with typed placeholder tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the lower-cased,
    whitespace-normalized text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(c), r"\s+", " "))
