"""Text analysis for large-scale training-data pipelines (mandate item —
no reference citations; the reference has no text operators, SURVEY §2.9).

Everything is native Column expressions (split/filter/aggregate/regexp) —
no Python UDFs — so the whole module stays inside whole-stage codegen and
scales linearly with executors. Patterns are kept to the regex subset that
Java regex (Spark) and RE2 (DuckDB oracle) interpret identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sri_spark.functions.hashing import md5_int

# small distinctive stopword lexicons for n-gram-free language ID;
# overlaps (de/la/en/que across es-fr) are fine — scoring + a fixed
# tie-break order keep the decision deterministic
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las", "por", "una", "es", "para"],
    "fr": ["le", "la", "les", "de", "des", "et", "en", "une", "un", "est", "dans", "que", "pour", "qui"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein", "eine", "zu", "auf"],
}

# BPE-ish pre-tokenization: letter runs | digit runs | single other non-space
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# CJK unified ideographs (literal-range class — identical in Java regex & RE2)
CJK_PATTERN = "[一-鿿]"

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 131
TOKEN_HASH_MOD = 1_000_003

# PII patterns kept to the regex subset Java regex and RE2 read identically
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9()-]{6,}[0-9]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lower(trim(text)), empty strings removed."""
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda x: x != F.lit("")
    )


def bpe_tokens_col(text: Column) -> Column:
    """BPE-ish pre-tokenizer: regex token runs (letters / digits / punct)."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def _count_matches(text: Column, pattern: str) -> Column:
    """Number of pattern matches = size of regexp_extract_all."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")


def quality_features(
    text: Column, *, toks: Column | None = None
) -> dict[str, Column]:
    """Length / punctuation / digit / stopword-density features used for
    document quality scoring. All ratios rounded for cross-engine equality.
    Pass a materialized `toks` column to avoid re-deriving the token split
    per consuming expression (a constant-factor cost, not the lambda-CSE
    quadratic — the lambdas here never reference the array in their
    bodies)."""
    toks = toks if toks is not None else tokens_col(text)
    n_chars = F.length(text).cast("long")
    n_tokens = F.size(toks).cast("long")
    en_hits = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS["en"]))
    ).cast("long")
    punct = _count_matches(text, r"[^A-Za-z0-9\s]")
    digits = _count_matches(text, r"[0-9]")
    avg_token_len = F.round(
        F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0)), 4
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": avg_token_len,
        "punct_ratio": F.round(punct / F.greatest(n_chars, F.lit(1)), 6),
        "digit_ratio": F.round(digits / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(en_hits / F.greatest(n_tokens, F.lit(1)), 6),
    }


def quality_score(text: Column, *, toks: Column | None = None) -> Column:
    """Composite [0,1] quality score: rewards mid-length docs with low
    punctuation/digit density (heuristic, deterministic)."""
    f = quality_features(text, toks=toks)
    length_term = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.5 * length_term + 0.3 * (1 - f["punct_ratio"]) + 0.2 * (1 - f["digit_ratio"]),
        6,
    )


def _lang_hits(toks: Column, lang: str) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS[lang]))).cast("long")


def language_id(text: Column, *, toks: Column | None = None) -> Column:
    """Stopword-lexicon language ID with a CJK-ratio branch for zh.

    Decision: zh if CJK chars > 10% of length; else the lexicon with the most
    token hits in fixed preference order en > es > fr > de; 'unknown' if no
    lexicon hits.
    """
    toks = toks if toks is not None else tokens_col(text)
    cjk = _count_matches(text, CJK_PATTERN)
    n_chars = F.greatest(F.length(text).cast("long"), F.lit(1))
    en, es, fr, de = (_lang_hits(toks, lang) for lang in ("en", "es", "fr", "de"))
    return (
        F.when(cjk.cast("double") / n_chars > 0.10, F.lit("zh"))
        .when((en >= es) & (en >= fr) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= fr) & (es >= de) & (es > 0), F.lit("es"))
        .when((fr >= de) & (fr > 0), F.lit("fr"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("unknown"))
    )


def repetition_features(
    text: Column, *, toks: Column | None = None
) -> dict[str, Column]:
    """Within-document repetition signals (Gopher-style quality rules):
    most-common-word fraction and duplicate word-2/3-gram fractions. All
    higher-order array expressions over the token array — per-row compute
    bounded by document length, zero shuffles, whole-stage codegen.
    Fractions use integer numerators ((total - distinct) / total) so the
    DuckDB oracle divides the exact same integers.

    Pass `toks` as a MATERIALIZED column (select tokens_col(...) first)
    whenever the input is non-trivial: the top-frequency and n-gram
    expressions reference the token array inside lambda bodies, and
    Catalyst does no CSE inside lambdas — with the default derivation the
    document would re-tokenize once per distinct token."""
    toks = toks if toks is not None else tokens_col(text)
    n = F.size(toks).cast("long")
    top_freq = F.when(
        n > 0,
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda d: F.size(F.filter(toks, lambda x: x == d)),
            )
        ),
    ).otherwise(F.lit(0)).cast("long")

    def grams(width: int) -> Column:
        idx = F.sequence(F.lit(1), (n - (width - 1)).cast("int"))
        return F.when(
            n >= width,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + off) for off in range(width)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def dup_fraction(g: Column) -> Column:
        total = F.size(g).cast("long")
        distinct = F.size(F.array_distinct(g)).cast("long")
        return F.round(
            F.when(total > 0, (total - distinct).cast("double") / total).otherwise(
                F.lit(0.0)
            ),
            6,
        )

    return {
        "n_tokens": n,
        "top_word_fraction": F.round(
            F.when(n > 0, top_freq.cast("double") / n).otherwise(F.lit(0.0)), 6
        ),
        "dup_2gram_fraction": dup_fraction(grams(2)),
        "dup_3gram_fraction": dup_fraction(grams(3)),
    }


def redact_pii(text: Column) -> Column:
    """Mask emails then phone numbers with typed placeholders — the
    pre-training PII scrub. Plain regexp_replace: stays in codegen."""
    redacted = F.regexp_replace(text, EMAIL_PATTERN, "[EMAIL]")
    return F.regexp_replace(redacted, PHONE_PATTERN, "[PHONE]")


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class (pre-redaction audit numbers)."""
    return {
        "n_emails": _count_matches(text, EMAIL_PATTERN),
        "n_phones": _count_matches(text, PHONE_PATTERN),
    }


def doc_fingerprint(text: Column, *, prefix: int | None = None) -> Column:
    """Order-sensitive rolling-hash fingerprint over the token stream:
    fold((acc * 131 + md5int(token) % 1e6+3) % 1e9+7). Two documents share a
    fingerprint iff their (prefix-)token sequences match — a cheap pre-filter
    for exact-dedup at scale. `prefix=k` fingerprints only the first k tokens,
    the usual blocking key (near-dup docs share openings far more often than
    whole bodies; false positives are resolved by a full compare inside the
    block). Cross-engine reproducible (md5-based, hashing.py)."""
    toks = tokens_col(text)
    if prefix is not None:
        toks = F.slice(toks, 1, prefix)
    hashed = F.transform(toks, lambda t: md5_int(t) % TOKEN_HASH_MOD)
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FINGERPRINT_BASE + x) % FINGERPRINT_MOD,
    )
