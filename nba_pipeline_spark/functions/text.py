"""Text-analysis functions for training-data pipelines (SURVEY.md §2.10 X5).

All built-in Column expressions (split/filter/transform lambdas run in
the JVM) — no Python in the hot path, so these scan 100 TB of documents
at parquet-read speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .exprs import let

# Tiny per-language marker lists for the n-gram/stopword language ID
# heuristic. Deliberately small: the point is the Spark shape (array
# intersection scoring), not linguistic coverage.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

STOPWORDS = ["the", "a", "an", "of", "to", "and", "in", "is", "it", "that"]


def tokenize(col: Column) -> Column:
    """Whitespace tokenization of lowercased text, empties removed."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != F.lit(""))


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(col))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token estimate: runs of letters, runs of digits, and
    single other non-space chars each count as one token."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), 0))


def stopword_ratio(tokens: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS)])
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(tokens), F.lit(1))


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars."""
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def mean_token_len(tokens: Column) -> Column:
    total = F.aggregate(tokens, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(tokens), F.lit(1))


def quality_score(text: Column, toks: Column) -> dict[str, Column]:
    """Composite quality signals (length / punctuation / stopword ratios)
    for document filtering; returns named component columns.

    ``toks`` must be a MATERIALIZED tokens column (withColumn /
    select-alias boundary), not an inline tokenize() expression: lambda
    bodies referencing a non-attribute expression re-evaluate it per
    array element — O(tokens²) per row."""
    return {
        "n_chars_q": F.length(text),
        "n_tokens": F.size(toks),
        "stop_ratio": stopword_ratio(toks),
        "punct_ratio": punct_ratio(text),
        "mean_tok_len": mean_token_len(toks),
    }


def lang_id(toks: Column) -> Column:
    """Marker-token language ID over a materialized tokens column: the
    language with the most marker hits wins; ties and zero-hit rows fall
    back to 'und'.

    Deterministic tie-break: languages evaluated in fixed order, strict
    greater-than to switch.
    """
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        switch = hits > best_hits
        best_lang = F.when(switch, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(switch, hits).otherwise(best_hits)
    return best_lang


def shingles(tokens: Column, n: int = 3) -> Column:
    """Token n-grams as strings; rows with < n tokens (or a NULL token
    array) yield an empty array.

    The NULL guard matters: ``size(NULL) < n`` is NULL, which a bare
    when() treats as false — NULL-text rows would fall into the build
    branch and emit arrays of NULL shingles (found as an MLlib
    'at least 1 non zero entry' crash downstream).

    The `tokens` expression is LET-BOUND (see functions/exprs.py): the
    normal call shape passes a computed `tokenize(text)` expression,
    and this builder references it n+3 times — n of them inside the
    per-element lambda, i.e. re-evaluated per SHINGLE. Unbound, each
    document was re-tokenized ~n_shingles×n times (measured
    10.9 s → 0.6 s for a 5000-doc scan at sf0.1, identical output)."""

    def build(toks: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
        return F.when(
            toks.isNull() | (F.size(toks) < n), F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
                ),
            )
        )

    return let(tokens, build)


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 over the sorted distinct token
    set — key for exact near-canonical dedup.

    NULL text -> NULL fingerprint (concat_ws would silently turn a NULL
    array into '' and merge NULL-text docs with empty-text docs)."""
    toks = tokenize(text)
    return F.when(
        text.isNotNull(), F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    )


def rolling_hashes(tokens: Column, n: int = 3) -> Column:
    """Per-position n-gram md5 hashes (rolling fingerprint stream);
    winnowing keeps per-window minima of this stream."""
    return F.transform(shingles(tokens, n), lambda s: F.md5(s))
