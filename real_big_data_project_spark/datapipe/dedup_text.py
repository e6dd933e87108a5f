"""Text deduplication families: exact, MinHash+LSH, n-gram Jaccard,
SimHash, and winnowing-style document fingerprints.

All hashing is md5-based (functions/hashing.py) so signatures are
bit-reproducible in the DuckDB oracle. Every operator is expression-only
(whole-stage codegen; no Python in the hot path).

Scale shape (the 100 TB story):
  * signatures are a map-only pass over the corpus;
  * candidate generation shuffles once on the band/bucket key — group
    sizes are bounded by design (a band key only collides for genuinely
    similar docs), and AQE skew-join splitting covers adversarial keys;
  * verification (Jaccard / Hamming) runs only on candidate pairs, never
    the O(n²) cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    lsh_bands,
    minhash_signature,
    simhash32_bits,
    word_shingles,
)
from ..functions.text import fingerprint

SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 4 bands × 8 bits: hamming ≤ 3 ⇒ ≥1 identical band


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Exact dedup via content fingerprint: one row per distinct content,
    keeping the smallest doc_id (deterministic keeper policy) and the
    group size. A single hash-aggregate — the cheapest dedup at any scale."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_docs"),
        )
    )


def shingle_sets(docs: DataFrame, n: int, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(text_col, n).alias("shingles"),
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    n_shingle: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash + LSH banding: (doc_a < doc_b, n_bands) candidate pairs.

    shingle → minhash signature (map-only) → explode band keys →
    self-equi-join on the band key (the ONE shuffle) → count shared bands.
    With 4 bands × 4 rows, docs with Jaccard j collide w.p. 1-(1-j⁴)⁴ —
    ≈1 for the planted near-dups (j ≈ 0.9), ≈0 for unrelated docs.
    """
    rows_per_band = num_hashes // num_bands
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(word_shingles(text_col, n_shingle), num_hashes).alias("sig"),
    )
    bands = sig.select(
        "doc_id", F.explode(lsh_bands(F.col("sig"), num_bands, rows_per_band)).alias("band")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_bands"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    n_shingle: int = 3,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard verification over candidate pairs:
    (doc_a, doc_b, jaccard ≥ threshold). Jaccard is |∩|/|∪| of distinct
    shingle sets — integer-ratio arithmetic, so bit-identical across
    engines. Joins shingle sets to the (small) candidate set; never O(n²)."""
    sh = shingle_sets(docs, n_shingle, id_col, text_col)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    return (
        candidates.select("doc_a", "doc_b")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-duplicate pairs: (doc_a < doc_b, hamming ≤ max_hamming).

    32-bit fingerprint, blocked on 4 bands of 8 bits: any pair within
    Hamming distance 3 shares at least one exact band (pigeonhole), so the
    band join finds ALL qualifying pairs — no recall loss, one shuffle.
    """
    width = SIMHASH_BITS // SIMHASH_BANDS
    sig = docs.select(
        F.col(id_col).alias("doc_id"), simhash32_bits(text_col).alias("sig")
    )
    band_keys = F.array(*[
        F.concat(F.lit(f"b{i}:"), F.substring("sig", i * width + 1, width))
        for i in range(SIMHASH_BANDS)
    ])
    bands = sig.select("doc_id", "sig", F.explode(band_keys).alias("band"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.aggregate(
        F.sequence(F.lit(1), F.lit(SIMHASH_BITS)),
        F.lit(0),
        lambda acc, i: acc + F.when(
            F.substring(F.col("sig_a"), i, F.lit(1))
            != F.substring(F.col("sig_b"), i, F.lit(1)),
            1,
        ).otherwise(0),
    )
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


WINNOW_GRAM_CHARS = 8


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-style, mod-16 sampled):
    md5 every 8-char gram of the normalized text, keep grams whose hash
    starts with '0' (deterministic 1/16 sample of the rolling windows),
    and fingerprint the sorted sample. Robust to small edits away from the
    sampled grams — the shape of MOSS/winnowing, expression-only."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    n_grams = F.greatest(F.length(norm) - (WINNOW_GRAM_CHARS - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.substring(norm, i, F.lit(WINNOW_GRAM_CHARS)),
    )
    sampled = F.array_sort(F.array_distinct(
        F.filter(grams, lambda g: F.md5(g).startswith("0"))
    ))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        fingerprint(text_col).alias("content_fp"),
        F.md5(F.array_join(sampled, "|")).alias("winnow_fp"),
        F.size(sampled).cast("bigint").alias("n_sampled_grams"),
    )
