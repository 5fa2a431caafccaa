"""Text feature builders: tokens, word shingles, fingerprints.

All pure column expressions (split / transform / sequence / slice) so
tokenization stays inside whole-stage codegen. Shared by the dedup
family and text analysis so Spark and oracle SQL agree on ONE
tokenization definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda x: x != "")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles as space-joined strings.

    DuckDB equivalent (kept in lockstep by the dedup oracles):
    ``list_distinct(list_transform(range(1, len(w) - n + 2),
    i -> w[i] || ' ' || ... ))``
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    shingles = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )
    # Spark's sequence(1, x) DESCENDS when x < 1 — guard short docs.
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, shingles).otherwise(empty)


def drop_last_tokens(text: Column | str, k: int = 2) -> Column:
    """Deterministic near-duplicate mutation: drop the last k tokens.
    Used to inject known near-dups into `documents` (FIXTURES.md says
    none exist naturally)."""
    toks = tokens(text)
    return F.concat_ws(" ", F.slice(toks, 1, F.greatest(F.size(toks) - k, F.lit(1))))


def normalized(text: Column | str) -> Column:
    """Whitespace-collapsed, lower-cased, trimmed canonical form."""
    c = F.col(text) if isinstance(text, str) else text
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
