"""Text-analysis expressions for large-scale corpus processing.

All pure Column expressions (JVM-side): token counting, quality scoring,
language-ID heuristic, fingerprinting. Designed for the `documents` table
(doc_id, text, lang, source, n_chars) but schema-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.size(F.split(c, r"\s+"))
    ).cast("bigint")


def char_count(col: Column | str) -> Column:
    return F.length(_c(col)).cast("bigint")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not [a-zA-Z0-9 ]."""
    c = _c(col)
    total = F.length(c)
    alnum = F.length(F.regexp_replace(c, "[^a-zA-Z0-9 ]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        (total - alnum).cast("double") / total.cast("double")
    )


def mean_token_length(col: Column | str) -> Column:
    c = F.trim(_c(col))
    n = token_count(col)
    nonspace = F.length(F.regexp_replace(c, r"\s+", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        nonspace.cast("double") / n.cast("double")
    )


# A tiny portable stopword set — quality scoring only needs a stable signal,
# not linguistic perfection.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are stopwords (lowercased exact match)."""
    c = F.lower(F.trim(_c(col)))
    toks = F.split(c, r"\s+")
    n = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        stop.cast("double") / n.cast("double")
    )


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]: length band +
    mean-token-length band + stopword presence. Deterministic and
    SQL-expressible for the oracle."""
    n = token_count(col)
    mtl = mean_token_length(col)
    sw = stopword_ratio(col)
    score = (
        F.when((n >= 10) & (n <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mtl >= 2.0) & (mtl <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(sw >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return score


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Stable across engines (md5 is md5) — the exact-dedup key."""
    c = F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")
    return F.md5(c)


# Language-ID: character-frequency heuristic over a few marker n-grams per
# language. Deterministic, portable to SQL. Not a real langid model — the
# plumbing (expression shape, scoring argmax) is what matters at scale.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the ", " of ", " and "),
    "fr": (" le ", " de ", " et "),
    "es": (" el ", " de ", " y "),
    "de": (" der ", " und ", " die "),
    "zh": ("的", "了", "是"),
}


def _marker_hits(c: Column, markers: tuple[str, ...]) -> Column:
    hits = None
    for m in markers:
        h = (
            F.length(c) - F.length(F.replace(c, F.lit(m), F.lit("")))
        ) / F.length(F.lit(m))
        hits = h if hits is None else hits + h
    return hits


def lang_guess(col: Column | str) -> Column:
    """Argmax language over marker-hit counts; 'und' when nothing fires.
    Ties break by language-code order (deterministic)."""
    c = F.concat(F.lit(" "), F.lower(_c(col)), F.lit(" "))
    scores = [
        F.struct(
            _marker_hits(c, markers).cast("double").alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    # greatest() on (score, lang) structs picks max score; lexicographically
    # LARGEST lang wins ties — mirror this exactly in the oracle.
    best = F.greatest(*scores)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
