"""Portable hashing primitives for dedup at scale.

Everything is built on md5 (identical output in Spark, DuckDB, and every
other engine) so that MinHash/SimHash signatures are reproducible across
the engine and the correctness oracle. Spark's native xxhash64/murmur is
faster but engine-specific; md5 keeps the gate honest and is still
JVM-side/codegen'd.

MinHash here uses the *lexicographic min of salted md5 hex digests*: for a
random oracle H, min over shingles of H(salt_i || s) is a valid min-wise
signature component (each salt simulates an independent permutation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalized_tokens(col: Column | str) -> Column:
    """Lowercase whitespace tokens of the normalized text."""
    c = F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")
    return F.split(c, " ")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-gram word shingles as array<string>. Documents shorter
    than n tokens yield their full text as the single shingle (so they can
    still collide exactly)."""
    toks = normalized_tokens(col)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(grams)


def _salted_min(shingles: Column, salt: int) -> Column:
    # NB: the lambda must take exactly one arg — PySpark infers higher-order
    # -function arity from the lambda signature, so a `i=salt` default arg
    # would silently rebind to transform's (value, index) form.
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{salt}:"), s)))
    )


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """array<string> of length `num_hashes`: per salt, the lexicographic
    min of md5(salt || ':' || shingle)."""
    return F.array(*[_salted_min(shingles, i) for i in range(num_hashes)])


def lsh_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """array<string> of band keys: band index + md5 of the band's slice of
    the signature. Two docs share a band key iff the band's rows all match."""
    bands = [
        F.concat(
            F.lit(f"b{b}:"),
            F.md5(F.array_join(F.slice(signature, b * rows_per_band + 1, rows_per_band), "|")),
        )
        for b in range(num_bands)
    ]
    return F.array(*bands)


def simhash64_bits(col: Column | str) -> Column:
    """SimHash-64 fingerprint as a string of 64 bits.

    Per token, one md5 yields 64 independent bits: positions 1..32 take
    the HIGH bit of each hex nibble (hex char ∈ {8..f}), positions 33..64
    the SECOND bit of the same nibbles (hex char ∈ {4..7, c..f}). Sum
    +1/−1 votes per position over tokens, then take signs. Portable: the
    oracle reproduces it with the same md5/substr/instr calls.

    Reference implementation (interpreted HOF folds, fine on the small
    arrays tests use); the production path is the explode/aggregate
    datapipe/dedup_text.py::simhash_signatures, pinned bit-for-bit equal
    by tests/test_datapipe.py.
    """
    toks = normalized_tokens(col)
    bit_cols = [
        F.when(_bit_vote(toks, pos, "89abcdef") >= 0, F.lit("1"))
        .otherwise(F.lit("0"))
        for pos in range(1, 33)
    ] + [
        F.when(_bit_vote(toks, pos, "4567cdef") >= 0, F.lit("1"))
        .otherwise(F.lit("0"))
        for pos in range(1, 33)
    ]
    return F.concat(*bit_cols)


def _bit_vote(toks: Column, pos: int, ones: str) -> Column:
    # Closure factory (not a default arg) — see _salted_min's arity note.
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc
        + F.when(
            F.instr(F.lit(ones), F.substring(F.md5(t), pos, 1)) > 0,
            F.lit(1),
        ).otherwise(F.lit(-1)),
    )


def hamming_distance_bits(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length '0'/'1' strings."""
    pairs = F.zip_with(
        F.split(a, ""),
        F.split(b, ""),
        lambda x, y: F.when(x != y, 1).otherwise(0),
    )
    return F.aggregate(pairs, F.lit(0), lambda acc, v: acc + v)
